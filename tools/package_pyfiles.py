"""Build dist/pacts_spark.zip for ``spark-submit --py-files`` (north_rule
launch mode). Pure stdlib; deterministic entry order and timestamps so the
artifact is reproducible."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DIST = REPO / "dist"
FIXED_TS = (2026, 1, 1, 0, 0, 0)  # reproducible artifact, never now()


def main() -> Path:
    DIST.mkdir(exist_ok=True)
    out = DIST / "pacts_spark.zip"
    files = sorted((REPO / "pacts_spark").rglob("*.py"))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=FIXED_TS)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    print(f"{out} ({out.stat().st_size} bytes, {len(files)} files)")
    return out


if __name__ == "__main__":
    main()
