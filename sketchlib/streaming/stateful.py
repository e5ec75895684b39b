"""Custom stateful streaming operators via applyInPandasWithState.

The reference is batch-only; this is the Structured-Streaming-native
form of "keep a sketch per key as events arrive": the per-key state is
a serialized sketchlib sketch blob held in Spark's state store, each
micro-batch folds its Arrow batches into the state with the same
vectorized kernels, and the operator emits the running estimate.
Checkpointing, exactly-once state updates, and recovery come from the
engine (state store + WAL), not from us — the sketch just has to be a
mergeable/serializable monoid, which every sketchlib sketch is.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from ..serde import loads

OUTPUT_SCHEMA = "key string, n_rows long, estimate double"
STATE_SCHEMA = "state binary, n_rows long"


def hll_distinct_by_key(
    grouped,  # stream_df.groupBy(key_col) result
    factory: Callable[[], object],
    timeout: str = "NoTimeout",
    value_col: str | None = None,
):
    """stream.groupBy(key) → running per-key distinct estimate.

    Usage:
        out = hll_distinct_by_key(
            events.groupBy("user_id"), lambda: HyperLogLog(12),
            value_col="event_type")
        out.writeStream...

    ``value_col`` names the column to sketch. Pass it explicitly:
    the None default falls back to the stream DataFrame's SECOND
    column (applyInPandasWithState delivers batches in original
    column order), which silently sketches the wrong column — often
    the grouping key itself, making every estimate ~1 — whenever the
    stream's columns aren't exactly (key, value).

    State per key = (sketch blob, rows seen). Works for any sketch with
    ``update`` + a scalar ``estimate()`` (HLL; CMS total; KLL n).
    """

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, n = state.get
            sk = loads(bytes(blob))
        else:
            sk, n = factory(), 0
        for pdf in pdfs:
            vals = pdf[value_col] if value_col is not None else pdf.iloc[:, 1]
            sk.update(vals)
            n += len(pdf)
        state.update((sk.to_bytes(), n))
        yield pd.DataFrame(
            {"key": [str(key[0])], "n_rows": [n], "estimate": [float(sk.estimate())]}
        )

    return grouped.applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
