from openmldb_ray.sql.planner import sql  # noqa: F401
