"""Feature encoding: strings → indexed/one-hot, features → vector.

Reference behaviors (file:line cite /root/reference/):
* categorical factorization — solution_pipeline/create_solution.py:117-119
  (pd.factorize) and OHE — data_processing/preprocessing.py:136-150.
* the engineered frame keeps original columns; encoded columns are
  appended (preprocessing.py:61).

Spark has no 'category' dtype; StringIndexer produces a double index
column (dictionary encoding lives inside Parquet).  The assembler
output is the single vector column MLlib estimators consume.
handleInvalid='keep' maps labels unseen at fit time (test-only
categories) to an extra index instead of failing mid-pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

FEATURES_COL = "features"


def build_feature_pipeline(
    df: DataFrame,
    feature_cols: Sequence[str],
    one_hot: bool = False,
    features_col: str = FEATURES_COL,
) -> Pipeline:
    """Assemble ``feature_cols`` into ``features_col``, string-indexing
    (and optionally one-hot-encoding) any string columns first."""
    dtypes = dict(df.dtypes)
    stages = []
    vec_inputs: list[str] = []
    for c in feature_cols:
        if dtypes.get(c) == "string":
            idx = f"{c}__idx"
            stages.append(
                StringIndexer(
                    inputCol=c, outputCol=idx, handleInvalid="keep"
                )
            )
            if one_hot:
                ohe = f"{c}__ohe"
                stages.append(OneHotEncoder(inputCol=idx, outputCol=ohe))
                vec_inputs.append(ohe)
            else:
                vec_inputs.append(idx)
        else:
            vec_inputs.append(c)
    stages.append(
        VectorAssembler(
            inputCols=vec_inputs, outputCol=features_col, handleInvalid="keep"
        )
    )
    return Pipeline(stages=stages)


def fit_feature_pipeline(
    df: DataFrame, feature_cols: Sequence[str], one_hot: bool = False
) -> PipelineModel:
    return build_feature_pipeline(df, feature_cols, one_hot).fit(df)
