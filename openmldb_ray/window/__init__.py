from openmldb_ray.window.spec import Agg, WindowSpec
from openmldb_ray.window.runner import window_agg

__all__ = ["Agg", "WindowSpec", "window_agg"]
