from openmldb_ray.joins.last_join import last_join

__all__ = ["last_join"]
