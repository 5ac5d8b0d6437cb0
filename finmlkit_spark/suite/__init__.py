from ._registry import QUERIES, ORACLES

from . import bars_suite  # noqa: F401
from . import features_suite  # noqa: F401
from . import sequential_suite  # noqa: F401
from . import labels_suite  # noqa: F401
from . import footprint_suite  # noqa: F401
from . import text_suite  # noqa: F401
from . import io_suite  # noqa: F401
from . import pipeline_suite  # noqa: F401
from . import misc_suite  # noqa: F401
from . import multiuser_suite  # noqa: F401
from . import analytics_suite  # noqa: F401
from . import developing_suite  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]
