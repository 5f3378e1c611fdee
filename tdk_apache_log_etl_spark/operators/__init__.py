"""Operator registry. Importing this package registers every query."""

from .registry import EAGER_BUILD, ORACLES, QUERIES, query  # noqa: F401

from . import logmetrics  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import tpch_full  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import temporal  # noqa: F401,E402
from . import skew  # noqa: F401,E402
from . import packing  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import cdc  # noqa: F401,E402
from . import hygiene  # noqa: F401,E402
from . import chunking  # noqa: F401,E402
from . import graph  # noqa: F401,E402
from . import privacy  # noqa: F401,E402
from . import incremental  # noqa: F401,E402
from . import robuststats  # noqa: F401,E402
from . import growth  # noqa: F401,E402
from . import concentration  # noqa: F401,E402
from . import basket  # noqa: F401,E402
from . import mlprep  # noqa: F401,E402
from . import tablestats  # noqa: F401,E402
