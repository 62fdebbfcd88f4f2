"""Property test: the pyarrow _merge_slice kernel vs an independent model.

The r6 rewrite moved the native reader's dirty-MOR merge from pandas to
pure pyarrow compute.  The old pandas kernel shipped green for two rounds
(oracle-verified), so it serves as the independent MODEL here: hypothesis
generates adversarial slices (duplicate keys, null precombines, both
delete flags, null data columns, log-only keys, base-only keys, all three
payloads) and the two kernels must agree on the exact output multiset.

Covers the branch matrix prose tests can't: delete-as-newest vs
delete-in-the-middle barriers under OVERWRITE_NON_DEFAULTS, precombine
ties broken by commit/seqno, untouched duplicate-key pass-through,
all-deleted outputs, empty base or empty logs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from incubator_hudi_spark.config import (DELETE_MARKER, PAYLOAD_DEFAULT,
                                         PAYLOAD_OVERWRITE_LATEST,
                                         PAYLOAD_OVERWRITE_NON_DEFAULTS)
from incubator_hudi_spark.pyds import (API_DELETE, META_COMMIT_SEQNO,
                                       META_COMMIT_TIME, META_RECORD_KEY,
                                       _merge_slice)

DELETE_COLS = (DELETE_MARKER, API_DELETE)

SCHEMA = pa.schema([
    (META_RECORD_KEY, pa.string()),
    (META_COMMIT_TIME, pa.string()),
    (META_COMMIT_SEQNO, pa.string()),
    ("pc", pa.int64()),          # precombine (nullable)
    ("val", pa.int64()),         # data column (nullable)
    ("val2", pa.string()),       # second data column (nullable)
    (DELETE_MARKER, pa.bool_()),
    (API_DELETE, pa.bool_()),
])


def _merge_slice_model(base, logs, payload, precombine):
    """The round-5 pandas kernel, verbatim (oracle-green for two rounds) —
    kept here as the independent model the arrow kernel must match."""
    df = base.to_pandas(types_mapper=None)
    lg = logs.to_pandas(types_mapper=None)
    df["_new"] = False
    lg["_new"] = True
    df = pd.concat([df, lg], ignore_index=True)
    has_new = df.groupby(META_RECORD_KEY)["_new"].transform("max")
    untouched = df[~has_new & ~df["_new"]]
    touched = df[has_new].copy()
    order_cols = []
    if payload == PAYLOAD_DEFAULT and precombine and precombine in df.columns:
        order_cols.append(precombine)
    order_cols += [META_COMMIT_TIME, META_COMMIT_SEQNO]
    touched["_del_rank"] = touched[API_DELETE].astype("float64")
    order_cols.append("_del_rank")
    touched = touched.sort_values(order_cols, ascending=False,
                                  na_position="last", kind="stable")
    if payload == PAYLOAD_OVERWRITE_NON_DEFAULTS and len(touched):
        key = touched[META_RECORD_KEY]
        rn = touched.groupby(key, sort=False).cumcount()
        is_del = pd.Series(False, index=touched.index)
        for c in DELETE_COLS:
            if c in touched.columns:
                is_del |= (touched[c].astype("boolean").fillna(False)
                           .to_numpy(dtype=bool))
        del_rn = rn.where(is_del)
        barrier = del_rn.groupby(key.to_numpy()).transform("min")
        live = rn < barrier.fillna(np.inf)
        winners = touched.drop_duplicates(subset=[META_RECORD_KEY],
                                          keep="first").copy()
        data_cols = [c for c in touched.columns
                     if not c.startswith("_hoodie") and c not in ("_new",)]
        kv = winners[META_RECORD_KEY]
        for c in data_cols:
            filled = (touched[c].where(live)
                      .groupby(key.to_numpy(), sort=False).first())
            winners[c] = kv.map(filled)
        touched = winners.drop(columns=["_del_rank"])
    else:
        touched = (touched
                   .drop_duplicates(subset=[META_RECORD_KEY], keep="first")
                   .drop(columns=["_del_rank"]))
    out = pd.concat([untouched, touched], ignore_index=True)
    dead = np.zeros(len(out), dtype=bool)
    for c in DELETE_COLS:
        if c in out.columns:
            dead |= out[c].astype("boolean").fillna(False).to_numpy(dtype=bool)
    return out[~dead].drop(columns=["_new"])


def _norm_cell(v):
    """Sortable, type-normalized encoding (None/bool/int mix sorts fine)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ("0null",)
    if isinstance(v, (bool, np.bool_)):
        return ("1bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("2num", float(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("0null",) if np.isnan(f) else ("2num", f)
    if pd.isna(v):
        return ("0null",)
    return ("3str", str(v))


def _rowset_arrow(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    pdf = tbl.select(cols).to_pandas(types_mapper=None)
    return sorted(tuple(_norm_cell(v) for v in row)
                  for row in pdf.itertuples(index=False, name=None))


def _rowset_pandas(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(tuple(_norm_cell(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))


_row = st.tuples(
    st.sampled_from(["k0", "k1", "k2", "k3"]),              # record key
    st.sampled_from(["t1", "t2", "t3"]),                    # commit time
    st.integers(min_value=0, max_value=9),                  # seqno suffix
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),   # pc
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),   # val
    st.one_of(st.none(), st.sampled_from(["a", "b"])),      # val2
    st.one_of(st.none(), st.booleans()),                    # is_deleted
    st.one_of(st.none(), st.booleans()),                    # api_delete
)


def _table(rows, commit_prefix):
    return pa.Table.from_pydict({
        META_RECORD_KEY: [r[0] for r in rows],
        META_COMMIT_TIME: [commit_prefix + r[1] for r in rows],
        META_COMMIT_SEQNO: [f"{commit_prefix}{r[1]}_{i}_{r[2]}"
                            for i, r in enumerate(rows)],
        "pc": [r[3] for r in rows],
        "val": [r[4] for r in rows],
        "val2": [r[5] for r in rows],
        DELETE_MARKER: [r[6] for r in rows],
        API_DELETE: [r[7] for r in rows],
    }, schema=SCHEMA)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base_rows=st.lists(_row, max_size=10),
       log_rows=st.lists(_row, max_size=10),
       payload=st.sampled_from([PAYLOAD_OVERWRITE_LATEST, PAYLOAD_DEFAULT,
                                PAYLOAD_OVERWRITE_NON_DEFAULTS]),
       use_pc=st.booleans())
def test_arrow_kernel_matches_pandas_model(base_rows, log_rows, payload,
                                           use_pc):
    base = _table(base_rows, "1")      # base commits sort before log commits
    logs = _table(log_rows, "2")
    pc = "pc" if use_pc else None
    got = _rowset_arrow(_merge_slice(base, logs, payload, pc))
    want = _rowset_pandas(_merge_slice_model(base, logs, payload, pc))
    assert got == want
