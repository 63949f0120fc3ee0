"""Generate DuckDB-readable oracle fixtures for the image driver queries.

The image table is synthesized deterministically (make_image is a pure
function of (i, seed)), so the expected outputs of the image queries are
computable OUTSIDE Spark — plain Python over the same pure functions —
and pinned as parquet fixtures the driver's DuckDB oracle reads. This
turns the three `no_oracle` rows (image_roundtrip, image_phash_neardup,
image_tile_assign) into real row/schema/hash comparisons
(VERDICT r1 item 6).

Run:  python scripts/make_image_oracle.py      (writes dist/oracle/*.parquet)
Idempotent — same bytes every run (seeded generator, stable iteration).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _IMG_N as N  # noqa: E402  single source of truth
from eo_tools_spark.functions import imaging as IM  # noqa: E402
from eo_tools_spark.sources.synthetic import make_image  # noqa: E402

N_DUP = 20
SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist", "oracle")


def rows(n=N, seed=SEED):
    for i in range(n):
        yield make_image(i, seed)


def build_roundtrip() -> pd.DataFrame:
    out = []
    for r in rows():
        image_id, data, w, h, fmt, caption = r[0], r[1], r[2], r[3], r[4], r[5]
        ref_img = r[-1]
        got = IM.decode_image(data, fmt, w, h)
        p = IM.psnr(ref_img, got)
        ok = (
            bool(np.array_equal(ref_img, got))
            if fmt in ("png", "raw")
            else bool(p >= 40.0)
        )
        out.append((image_id, fmt, float(min(p, 999.0)), ok, True))
    return pd.DataFrame(
        out, columns=["image_id", "fmt", "psnr", "pixels_ok", "caption_ok"]
    )


def build_phash_pairs(max_hamming=3) -> pd.DataFrame:
    base = [(r[0], r[6]) for r in rows()]
    dup = [(f"dup-{iid}", ph) for iid, ph in base[:N_DUP]]
    allr = base + dup
    out = []
    for i in range(len(allr)):
        for j in range(len(allr)):
            a, ha = allr[i]
            b, hb = allr[j]
            if a < b:
                d = bin((ha ^ hb) & (2**64 - 1)).count("1")
                if d <= max_hamming:
                    out.append((a, b, d))
    return (
        pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])
        .astype({"hamming": "int32"})
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def build_meta() -> pd.DataFrame:
    out = [(r[0], r[7], r[8]) for r in rows()]
    return pd.DataFrame(out, columns=["image_id", "lon", "lat"])


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    build_roundtrip().to_parquet(os.path.join(OUT, f"image_roundtrip_{N}.parquet"), index=False)
    build_phash_pairs().to_parquet(os.path.join(OUT, f"image_phash_pairs_{N}.parquet"), index=False)
    build_meta().to_parquet(os.path.join(OUT, f"images_meta_{N}.parquet"), index=False)
    print(f"wrote 3 oracle fixtures to {OUT}")


if __name__ == "__main__":
    main()
