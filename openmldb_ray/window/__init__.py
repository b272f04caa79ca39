from openmldb_ray.window.spec import Agg, WindowSpec
from openmldb_ray.window.runner import (window_agg, window_agg_concat,
                                        window_agg_multi)

__all__ = ["Agg", "WindowSpec", "window_agg", "window_agg_multi",
           "window_agg_concat"]
