from openmldb_ray.joins.last_join import last_join
from openmldb_ray.joins.hash_join import hash_join

__all__ = ["last_join", "hash_join"]
