"""certa_spark — a PySpark-native engine with the capabilities of
tteofili/certa (saliency + counterfactual explanations for Entity
Resolution models), rebuilt Spark-first.

The reference (/root/reference) is single-threaded pandas; this engine
re-expresses every operator as DataFrame/SQL plans so Catalyst picks
physical strategies (broadcast joins, partial aggregation, AQE) and the
same code scales from local[32] to a multi-executor cluster.

Public surface:
    CertaExplainer          — certa/explain.py:11 parity facade
    NativeCosineMatcher     — deterministic JVM-side matcher (tests/scale)
    PandasPredictAdapter    — mapInPandas bridge for arbitrary pandas
                              ``predict_fn`` models (torch/TF wrappers)
"""

from certa_spark.explainer import CertaExplainer
from certa_spark.matching import NativeCosineMatcher, PandasPredictAdapter
from certa_spark.session import get_spark

__all__ = [
    "CertaExplainer",
    "NativeCosineMatcher",
    "PandasPredictAdapter",
    "get_spark",
]

__version__ = "0.1.0"
