from .session import get_spark  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
from .bucketed import write_bucketed_edges, read_bucketed_edges  # noqa: F401
