"""Pure pandas/python extraction + quality kernels (no Spark imports).

``reference_oracle`` is the row-at-a-time specification (tests only);
``quality`` and ``extract`` are the vectorized production kernels.
"""

from epstein_browser_spark.core.extract import extract_batch  # noqa: F401
from epstein_browser_spark.core.quality import (  # noqa: F401
    classify_low_quality_batch,
    quality_score_batch,
)
