from openmldb_ray.sources.load_data import load_data, select_into, Catalog

__all__ = ["load_data", "select_into", "Catalog"]
