"""Parquet sink helpers.

Reproduces the reference's sink semantics (``02.py:131-138``):
``coalesce(1).write.parquet(mode='overwrite')`` followed by promoting
the single part-file out of the job directory.  At 100 TB scale a
single output file is wrong, so single-file mode is an *option*
(default off) and the normal path writes partitioned output, letting
AQE pick output partition counts.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> str:
    """Write ``df`` as parquet.

    ``single_file=True`` reproduces the reference's sink contract
    (one promoted part-file, reference ``02.py:131-138``) but via
    ``repartition(1)`` rather than the reference's ``coalesce(1)``:
    coalesce folds the ENTIRE upstream job into the single write task
    (measured 3x slower on the anchor pipeline), while repartition
    keeps the scan/parse stages parallel and serializes only the
    write.  Same file count, same row multiset.  Use only for small
    outputs.
    """
    if single_file:
        tmp_dir = path + "._job"
        df.repartition(1).write.parquet(tmp_dir, mode=mode)
        parts = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))
        if len(parts) != 1:
            raise RuntimeError(f"expected 1 part-file in {tmp_dir}, got {len(parts)}")
        if os.path.exists(path) and os.path.isfile(path):
            os.remove(path)
        shutil.move(parts[0], path)
        shutil.rmtree(tmp_dir)
        return path
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path
