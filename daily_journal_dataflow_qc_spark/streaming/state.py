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


def _positions(idx: int) -> np.ndarray:
    return (idx * _PRIMES[:SKETCH_D] + 17) % SKETCH_W


def _sketch_add(sk: np.ndarray, idx: int) -> None:
    sk[np.arange(SKETCH_D) * SKETCH_W + _positions(idx)] += 1


def _sketch_contains(sk: np.ndarray, idx: int) -> bool:
    return bool(sk[np.arange(SKETCH_D) * SKETCH_W + _positions(idx)].min() > 0)


def validate_conv(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    if state.exists:
        hwm, sketch_list = state.get
        sketch = np.array(sketch_list, dtype=np.int64)
    else:
        hwm, sketch = -1, np.zeros(SKETCH_D * SKETCH_W, dtype=np.int64)

    flags: list[tuple[str, int, str]] = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "turn_idx"])
        for idx in pdf["turn_idx"].astype(int):
            if idx > hwm:
                hwm = idx
                _sketch_add(sketch, idx)
            elif _sketch_contains(sketch, idx):
                flags.append((conv_id, idx, "duplicate"))
            else:
                flags.append((conv_id, idx, "out_of_order"))
                _sketch_add(sketch, idx)

    state.update((int(hwm), [int(x) for x in sketch]))
    if flags:
        yield pd.DataFrame(flags, columns=["conv_id", "turn_idx", "kind"])


def turn_stream_validator(turns: DataFrame) -> DataFrame:
    """Attach the keyed validator to a (streaming or batch-test) turn frame."""
    return turns.groupBy("conv_id").applyInPandasWithState(
        validate_conv,
        outputStructType=FLAG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
