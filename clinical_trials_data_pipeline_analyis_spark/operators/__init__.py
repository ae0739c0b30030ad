from .datespine import date_spine
from .surrogate_keys import surrogate_key_exact, surrogate_key_scalable

__all__ = ["date_spine", "surrogate_key_exact", "surrogate_key_scalable"]
