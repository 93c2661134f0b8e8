"""Round-15 additions: the decon replay hook's n_in comes from a
persisted batch manifest rather than a kept+flagged row-count
derivation — the derivation undercounts when a flagged id spans
multiple input rows, because flagged is one row per id while the
anti-join drops every row of the id (ADVICE r14 #3).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_decon_replay_n_in_exact_with_multirow_flagged_id(spark, tmp_path):
    """A flagged id appearing on THREE input rows: the original
    delivery reports n_in=5 (3 dup rows + 2 clean). The manifest
    makes the checkpoint-loss replay report the same 5 — the old
    kept+flagged derivation would say 3 (2 kept rows + 1 flagged
    row-per-id) and undercount the monitor's sum."""
    from etl_spark.streaming.neardup import build_decon_index, run_decon_ingest

    dim = 64  # the banding planes are sized for the fixture dim

    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    hot = unit(0)  # matches the eval index exactly
    clean_a = unit(17)
    clean_b = unit(33)
    build_decon_index(
        spark.createDataFrame(
            [(100, hot)], "vec_id bigint, embedding array<double>"
        ),
        str(tmp_path / "eval_idx"),
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([7, 7, 7, 8, 9], pa.int64()),
                "embedding": [hot, hot, hot, clean_a, clean_b],
            }
        ),
        str(src / "b0.parquet"),
    )

    def run(tag, sink):
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_decon_ingest(
            stream,
            id_col="vec_id",
            emb_col="embedding",
            index_path=str(tmp_path / "eval_idx"),
            out_path=str(tmp_path / "clean"),
            flagged_path=str(tmp_path / "flagged"),
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
            cos_floor=0.99,
            on_batch=lambda b, n_in, n_fl: sink.append((b, n_in, n_fl)),
        )
        q.awaitTermination(120)

    first: list[tuple[int, int, int]] = []
    run("first", first)
    assert first == [(0, 5, 1)], first
    # all three rows of the flagged id were dropped from the output
    assert spark.read.parquet(str(tmp_path / "clean" / "batch-0")).count() == 2

    # fresh checkpoint => committed batch skipped; the manifest keeps
    # n_in exact where kept(2) + flagged(1) would report 3
    replay: list[tuple[int, int, int]] = []
    run("replay", replay)
    assert replay == first, replay
