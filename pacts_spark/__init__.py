"""pacts_spark — a PySpark-native schema + constraint validation engine.

From-scratch re-expression of Project-Hydrius/Pacts' check-row-against-
schema contracts (see SURVEY.md) as compiled Column-expression predicate
trees + vectorized pandas/Arrow UDFs, extended with engine-level checks
(column stats, uniqueness, referential integrity, distribution drift,
ts-gap quantiles) with per-partition verdicts and checkpointed resume.

Layout:
- errors.py      exact reference error-string catalog
- oracle.py      pure-Python differential-test oracle (reference semantics)
- registry.py    schema registry (dir/zip bundles, cache)
- compiler.py    schema → ordered (Column, msg) checks; relational + JSON modes
- engine.py      PactsEngine facade (validate / gate / violations / verdicts)
- model.py       envelope wire-format serde
- transcripts.py transcripts input shape (canonical derivation + generator)
- checks/        engine-level constraint checks (north_star)
- datapipe/      training-data pipeline ops (dedup, similarity, text, multimodal)
- checkpoint.py  manifest-based resume with per-partition lineage
- session.py     tuned SparkSession builder
"""

from pacts_spark.engine import PactsEngine, ValidationException
from pacts_spark.registry import SchemaRegistry

__all__ = ["PactsEngine", "SchemaRegistry", "ValidationException"]
__version__ = "0.1.0"
