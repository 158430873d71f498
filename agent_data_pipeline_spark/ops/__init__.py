from .asof import asof_join
from .sessionize import sessionize
from .skew import salted_agg, salted_join

__all__ = ["asof_join", "sessionize", "salted_agg", "salted_join"]
