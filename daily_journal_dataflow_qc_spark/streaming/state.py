"""Keyed per-conversation stream validator (north-star core data structure).

``applyInPandasWithState`` keyed by conv_id, holding O(1) state per
conversation regardless of stream length (SURVEY §7.3.8 — never store seen
turn-idx sets at 10^12-turn scale):

* ``hwm``   — monotone turn_idx high-watermark,
* ``sketch`` — a count-min sketch (D x W int64) used as an approximate
  membership filter over turn indices already accepted.

Per arriving turn (processed in (ts, turn_idx) order within the batch):

* turn_idx >  hwm            -> normal advance (gaps allowed; the reference
                                tolerates missing submissions),
* turn_idx <= hwm, in sketch -> DUPLICATE flag (re-delivery),
* turn_idx <= hwm, novel     -> OUT_OF_ORDER flag (late arrival below the
                                watermark line; reference logs, never drops
                                silently — journal_outputs_error_check.py),

Graft of the reference's tracking-file protocol ("previously processed
filename detected as new", mindlamp_accounting.py:196-198) without the
filesystem.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SKETCH_D = 4
SKETCH_W = 128
_PRIMES = np.array([1000003, 10000019, 100000007, 1000000007], dtype=np.int64)

FLAG_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # duplicate | out_of_order
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("hwm", T.LongType(), False),
        T.StructField("sketch", T.ArrayType(T.LongType()), False),
    ]
)


def _positions(idx: np.ndarray) -> np.ndarray:
    """(n, D) sketch slot positions for a vector of turn indices."""
    return (idx[:, None] * _PRIMES[None, :SKETCH_D] + 17) % SKETCH_W


def _slots(idx: np.ndarray) -> np.ndarray:
    return np.arange(SKETCH_D)[None, :] * SKETCH_W + _positions(idx)


def validate_conv(key, pdf_iter, state: GroupState):
    """Vectorized batch classification (no per-row Python on the hot path).

    Equivalence to the sequential spec (advance / duplicate / out_of_order
    processed in (ts, turn_idx) order):
    * every FIRST in-batch occurrence of an idx is added to the sketch when
      processed (whether as an advance or an out-of-order arrival), so a
      later in-batch repeat is always a duplicate,
    * an idx strictly above the running high-watermark (state hwm merged
      with the in-batch prefix max) cannot be in the sketch — everything
      added so far is <= that watermark — so 'advance' needs no sketch probe,
    * a first occurrence at/below the watermark is a duplicate iff the
      PERSISTENT sketch knows it (cross-batch re-delivery), else out-of-order
      (and only then added, matching the sequential add-on-ooo rule).
    """
    (conv_id,) = key
    if state.exists:
        hwm, sketch_list = state.get
        sketch = np.array(sketch_list, dtype=np.int64)
    else:
        hwm, sketch = -1, np.zeros(SKETCH_D * SKETCH_W, dtype=np.int64)

    # a large per-conv micro-batch spans multiple Arrow chunks: concat and
    # sort ONCE so the (ts, turn_idx) processing order is global, not
    # chunk-local (chunk-local sorts can flip duplicate vs out_of_order)
    chunks = [p for p in pdf_iter if len(p)]
    flags: pd.DataFrame | None = None
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "turn_idx"])
        idx = pdf["turn_idx"].to_numpy(dtype=np.int64)

        running = np.maximum.accumulate(np.concatenate(([hwm], idx)))[:-1]
        advance = idx > running
        first_occ = ~pd.Series(idx).duplicated(keep="first").to_numpy()
        in_sketch = sketch[_slots(idx)].min(axis=1) > 0
        low = ~advance
        dup = low & (~first_occ | in_sketch)
        ooo = low & first_occ & ~in_sketch

        add = first_occ & ~in_sketch  # advances + first-seen ooo arrivals
        if add.any():
            np.add.at(sketch, _slots(idx[add]).ravel(), 1)
        hwm = int(max(hwm, idx.max()))

        flagged = dup | ooo
        if flagged.any():
            flags = pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": idx[flagged].astype(np.int32),
                    "kind": np.where(dup[flagged], "duplicate", "out_of_order"),
                }
            )

    state.update((int(hwm), [int(x) for x in sketch]))
    if flags is not None:
        yield flags


def turn_stream_validator(turns: DataFrame) -> DataFrame:
    """Attach the keyed validator to a (streaming or batch-test) turn frame."""
    return turns.groupBy("conv_id").applyInPandasWithState(
        validate_conv,
        outputStructType=FLAG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
