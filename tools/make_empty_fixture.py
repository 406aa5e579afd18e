"""Build an EMPTY copy of an sf fixture (same schemas, zero rows) for
twin regression: an empty partition/day is a legitimate production
input, and neither the clean nor the poisoned fixture exercises the
empty-corpus paths (seed collects, sqrt(N) cell derivations, windows
over nothing, typeless literals). Usage:
python tools/make_empty_fixture.py [src] [dst]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/empty_sf")
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.slice(0, 0), dst / f.name)
        print(f"{f.name}: 0 rows, schema kept", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
