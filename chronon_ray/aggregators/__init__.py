from .ops import OPS  # noqa: F401
from .row import RowAggregator  # noqa: F401
