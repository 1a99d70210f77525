"""feature_engineering_spark — a PySpark-native point-in-time feature engine.

A from-scratch re-expression of the capabilities of
milenabaj/feature_engineering (single-node pandas/numpy, see
/root/reference) as an idiomatic Spark DataFrame engine:

- as-of (point-in-time) joins with tolerance + direction
  (reference: matching.pyc KDTree GM<->DRD alignment, data_transforms.py:37-61)
- 30-min-gap sessionization (reference: trip/pass segmentation)
- strictly causal lag/lead + rolling window statistics
  (reference: `[:-1]` exclusive window stats, positional causal splits)
- sliding distance/time windows with a 35-statistic feature kernel
  (reference: utils/analysis.py:153-219, utils/data_loaders.py:450-597)
- skew-aware partitioning (salted hot keys), resumable checkpoints with a
  lineage ledger (reference: pickle load-if-exists caching,
  utils/analysis.py:160-163)

Everything is DataFrame/Catalyst-first; Python executes only inside
Arrow-vectorized pandas UDFs / applyInPandas (never per-row).
"""

__version__ = "0.1.0"
