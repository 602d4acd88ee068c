"""Shared landing-zone helper for file-stream tests: ONE home for the
write/move/utime mechanics (review r10: test_round9._dp_landing and
test_round10._land_order_chunks each hand-rolled them; a change to the
replay contract — mtime base, part-file naming — had two homes)."""

from __future__ import annotations

import os
import shutil


def land_chunks(dfs, landing_dir: str, scratch_dir: str) -> list[str]:
    """Write each DataFrame as ONE parquet file in ``landing_dir``,
    mtime-ordered so a maxFilesPerTrigger=1 file stream replays them in
    list order. Returns the landed paths."""
    os.makedirs(landing_dir, exist_ok=True)
    base = 1_700_000_000
    paths = []
    for i, df in enumerate(dfs):
        tmp = os.path.join(scratch_dir, f"chunk-{i:02d}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        p = os.path.join(landing_dir, f"chunk-{i:02d}.parquet")
        shutil.move(os.path.join(tmp, part), p)
        os.utime(p, (base + i, base + i))
        paths.append(p)
    return paths
