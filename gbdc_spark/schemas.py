"""Static schemas — data-independent, like the reference's name lists
(base_feature_names is callable without a file, gbdlib.cc:204-213)."""

from __future__ import annotations

from pyspark.sql import types as T

from .kernels.cnf import BASE_FEATURES_NAMES
from .kernels.gates import GATE_FEATURE_NAMES
from .kernels.opb import OPB_BASE_FEATURES_NAMES
from .kernels.wcnf import WCNF_BASE_FEATURES_NAMES

__all__ = [
    "BASE_FEATURES_NAMES",
    "GATE_FEATURE_NAMES",
    "WCNF_BASE_FEATURES_NAMES",
    "OPB_BASE_FEATURES_NAMES",
    "SEQUENCES_SCHEMA",
    "feature_struct",
    "base_feature_names",
    "gate_feature_names",
    "wcnf_base_feature_names",
    "opb_base_feature_names",
]

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)


def feature_struct(names: tuple[str, ...]) -> T.StructType:
    return T.StructType([T.StructField(n, T.DoubleType(), True) for n in names])


# mirrors the reference's *_feature_names python surface (gbdlib.cc:204-243)
def base_feature_names() -> list[str]:
    return list(BASE_FEATURES_NAMES)


def gate_feature_names() -> list[str]:
    return list(GATE_FEATURE_NAMES)


def wcnf_base_feature_names() -> list[str]:
    return list(WCNF_BASE_FEATURES_NAMES)


def opb_base_feature_names() -> list[str]:
    return list(OPB_BASE_FEATURES_NAMES)
