from .asof import asof_join
from .sessionize import sessionize

__all__ = ["asof_join", "sessionize"]
