from openmldb_ray.sql.explain import explain  # noqa: F401
from openmldb_ray.sql.planner import sql  # noqa: F401
