"""Build a deterministic POISONED copy of an sf fixture for twin
regression (the round-4 lesson: latent twin crashes/divergences hide on
clean fixtures — DuckDB CAST(NaN AS BIGINT) raises, NULL keys reach
driver dicts, unicode tails, zero/ragged vectors). Appends adversarial
rows to documents / embeddings / events; copies the TPC-H-ish tables
unchanged. Usage: python tools/make_poisoned_fixture.py [src] [dst]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/poison_sf")
    dst.mkdir(parents=True, exist_ok=True)

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(src / f"{t}.parquet", dst / f"{t}.parquet")

    # -- documents: NULL/empty/whitespace text, unicode incl. astral +
    #    ZWJ, single huge doc, repeated-token pathologies, NULL lang/src
    d = pq.read_table(src / "documents.parquet")
    base = 9_000_000
    texts = [
        None,
        "",
        "   ",
        "héllo🌍 wörld " * 40,
        "a👩‍👩‍👧x " + "αβγδε " * 100,
        "tok " * 5000,                      # one token repeated (rep stats)
        "singleword",
        "\t tabs\tand\nnewlines \n mixed",
        "word " * 3 + "🌍" * 50,
        "the quick brown fox " * 250,       # near-dup of itself chunk-wise
    ]
    rows = {
        "doc_id": [base + i for i in range(len(texts))],
        "text": texts,
        "lang": [None, "xx", "en", "el", None, "en", "en", "en", "en", "en"],
        "source": [None, "", "poison", "poison", "poison",
                   "poison", "poison", "poison", "poison", "poison"],
        "n_chars": [None if t is None else len(t) for t in texts],
    }
    extra = pa.table(rows, schema=d.schema)
    pq.write_table(pa.concat_tables([d, extra]), dst / "documents.parquet")

    # -- embeddings: NULL vector, empty vector, ragged dims, NaN/Inf
    #    elements, NULL element, zero vector, huge magnitudes
    e = pq.read_table(src / "embeddings.parquet")
    dim = len(e.column("embedding")[0].as_py())
    vbase = 9_000_000
    vecs = [
        None,
        [],
        [0.5] * (dim // 2),                 # ragged short
        [0.5] * (dim + 3),                  # ragged long
        [float("nan")] * dim,
        [float("inf")] + [0.0] * (dim - 1),
        [0.0] * dim,                        # zero vector
        [1e30] * dim,                       # overflow-ish magnitude
        [None] + [0.25] * (dim - 1),        # NULL element
        [1.0] + [0.0] * (dim - 1),
    ]
    erows = {
        "vec_id": [vbase + i for i in range(len(vecs))],
        "embedding": vecs,
        "label": [None, 0, 1, 2, 3, 4, 5, 6, 7, 8],
    }
    eextra = pa.table(erows, schema=e.schema)
    pq.write_table(pa.concat_tables([e, eextra]), dst / "embeddings.parquet")

    # -- events: NULL ts, NULL user, NULL/weird event_type, NaN/Inf
    #    value, duplicate event_id, far-future/ancient ts, poisoned props
    ev = pq.read_table(src / "events.parquet")
    ebase = 9_000_000_000
    ets = pa.array(
        [None,
         np.datetime64("1970-01-01T00:00:00", "us"),
         np.datetime64("2199-12-31T23:59:59", "us"),
         np.datetime64("2026-01-01T00:00:00", "us"),
         np.datetime64("2026-01-01T00:00:00", "us"),   # exact tie
         np.datetime64("2026-01-01T00:00:01", "us"),
         np.datetime64("2026-01-01T02:00:00", "us"),
         np.datetime64("2026-01-01T02:00:00.000001", "us")],
        type=pa.timestamp("us"),
    )
    n = len(ets)
    evrows = pa.table(
        {
            "event_id": pa.array(
                [ebase, ebase + 1, ebase + 2, ebase + 3, ebase + 3,
                 ebase + 5, ebase + 6, ebase + 7], type=pa.int64()
            ),
            "ts": ets,
            "user_id": pa.array(
                [None, 7_777_001, 7_777_001, 7_777_002, 7_777_002,
                 7_777_002, 7_777_002, 7_777_002], type=pa.int64()
            ),
            "event_type": pa.array(
                [None, "", "error", "click", "click", "error",
                 "purchase", "purchase"], type=pa.string()
            ),
            "value": pa.array(
                [float("nan"), float("inf"), float("-inf"), None,
                 1e308, -1e308, 0.0, 1.5], type=pa.float64()
            ),
            "props": pa.array(
                [None, "", "not json", '{"turn_idx": "3"}',
                 '{"turn_idx": null}', '{"nested": {"deep": [1,2]}}',
                 '{"turn_idx": 9.5}', '{"turn_idx": 2}'],
                type=pa.string(),
            ),
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, evrows]), dst / "events.parquet")
    print(f"poisoned fixture at {dst}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
