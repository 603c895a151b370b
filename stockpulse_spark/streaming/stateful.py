"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no custom state beyond dedup (SURVEY §2.8), but a
streaming indicator engine needs one thing batch windows can't give:
indicators that CONTINUE across micro-batches. A recursive EMA is the
canonical case — y_t depends on the entire history, so each batch must
resume from the previous batch's final state instead of recomputing
the prefix.

`streaming_ema` keeps one (last_ema,) double per (symbol, span) in the
state store: O(keys) state, no growth with history length — contrast
with recomputing over an ever-growing window. Exactly the pattern to
extend for Wilder RSI, Kaufman AMA, or online variance at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUTPUT = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("ema", T.DoubleType()),
    ]
)
EMA_STATE = T.StructType([T.StructField("last_ema", T.DoubleType())])


def streaming_ema(
    df: DataFrame,
    span: int = 12,
    value_col: str = "close",
    key_col: str = "symbol",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-key EMA that resumes across micro-batches.

    Within a batch rows are folded in event-time order; the final EMA
    value persists in the state store and seeds the next batch. With
    in-order delivery per key (guaranteed by a keyed, time-ordered
    source or an upstream sorted foreachBatch) this equals the batch
    ewm(adjust=False) over the full history — asserted in
    tests/test_stateful.py.
    """
    alpha = 2.0 / (span + 1)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            emas = []
            for x in pdf[value_col]:
                last = x if last is None else (1 - alpha) * last + alpha * x
                emas.append(last)
            out.append(
                pd.DataFrame(
                    {
                        "symbol": symbol,
                        "timestamp": pdf[ts_col],
                        "close": pdf[value_col],
                        "ema": emas,
                    }
                )
            )
        state.update((last,))
        yield from out

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=EMA_OUTPUT,
        stateStructType=EMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
