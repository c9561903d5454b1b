from .session import get_spark  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
