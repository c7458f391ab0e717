"""Streaming HLL: multi-batch register merging matches the one-shot
batch sketch over the same payloads, and a replayed stream is a no-op
(max-merge idempotence + per-batch partition overwrite)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _mk_sources(spark, tmp_path, n_files=3, rows_per=60):
    src = tmp_path / "src"
    src.mkdir()
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    all_rows = []
    for f in range(n_files):
        rows = [
            (
                f"c{f}",
                i,
                "user",
                # overlapping payloads across files: dedup matters
                f"payload-{(f * rows_per + i) % (n_files * rows_per // 2)}",
                "",
                None,
            )
            for i in range(rows_per)
        ]
        all_rows.extend(rows)
        # the file stream lists files, not nested dirs: write to a
        # staging dir and link the part file into src as fN.parquet
        stage = tmp_path / f"stage{f}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        (src / f"f{f}.parquet").symlink_to(part)
    return src, all_rows


def test_stream_hll_matches_batch_sketch(spark, tmp_path):
    from pdftotext_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from pdftotext_spark.streaming.sketches import (
        hll_stream_estimate,
        run_hll_stream,
    )

    src, all_rows = _mk_sources(spark, tmp_path)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    run_hll_stream(spark, str(src), store, ckpt, max_files_per_trigger=1)

    # multiple micro-batches actually happened
    import glob

    parts = glob.glob(f"{store}/batch_id=*")
    assert len(parts) >= 2, parts

    streamed = hll_stream_estimate(spark, store).collect()[0]
    batch_df = spark.createDataFrame(
        [(r[3],) for r in all_rows], "text string"
    )
    one_shot = hll_estimate_from_registers(
        hll_registers(batch_df, "text")
    ).collect()[0]
    assert streamed.est_distinct == one_shot.est_distinct
    assert streamed.registers_hit == one_shot.registers_hit

    exact = len({r[3] for r in all_rows})
    rel_err = abs(streamed.est_distinct - exact) / exact
    assert rel_err < 0.5, (streamed.est_distinct, exact)  # m=64 sketch

    # replaying the whole stream (fresh checkpoint, same store) must
    # not move the estimate: max-merge is idempotent and each batch
    # overwrites its own partition
    run_hll_stream(spark, str(src), store, str(tmp_path / "ckpt2"))
    replayed = hll_stream_estimate(spark, store).collect()[0]
    assert replayed.est_distinct == streamed.est_distinct


def test_stream_cms_matches_batch_sketch(spark, tmp_path):
    from pdftotext_spark.operators.sketches import (
        cms_counters,
        cms_point_estimate,
    )
    from pdftotext_spark.streaming.sketches import (
        cms_stream_counters,
        run_cms_stream,
    )

    src, all_rows = _mk_sources(spark, tmp_path)
    store = str(tmp_path / "cms_store")
    run_cms_stream(spark, str(src), store, str(tmp_path / "cms_ckpt"))

    merged = cms_stream_counters(spark, store)
    batch_df = spark.createDataFrame([(r[3],) for r in all_rows], "text string")
    toks = batch_df.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    one_shot = cms_counters(toks)
    # counter tables identical: multi-batch sum-merge == one-shot
    assert (
        merged.exceptAll(one_shot).count() == 0
        and one_shot.exceptAll(merged).count() == 0
    )
    # point estimate works against the merged sketch and never
    # undercounts the true frequency
    from collections import Counter

    true = Counter(r[3] for r in all_rows)
    tok, cnt = true.most_common(1)[0]
    est = cms_point_estimate(merged.cache(), tok)
    assert est >= cnt

    # replay with a fresh checkpoint: partition overwrite keeps the
    # additive counters exactly-once (no double counting)
    run_cms_stream(spark, str(src), store, str(tmp_path / "cms_ckpt2"))
    replayed = cms_stream_counters(spark, store)
    assert replayed.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(replayed).count() == 0


def test_stream_bloom_no_false_negatives(spark, tmp_path):
    from pdftotext_spark.streaming.sketches import (
        bloom_probe,
        run_bloom_stream,
    )

    src, all_rows = _mk_sources(spark, tmp_path)
    store = str(tmp_path / "bloom_store")
    run_bloom_stream(spark, str(src), store, str(tmp_path / "bloom_ckpt"))

    seen = {r[3] for r in all_rows}
    probe_rows = [(t,) for t in sorted(seen)] + [
        (f"never-seen-{i}",) for i in range(50)
    ]
    probe = spark.createDataFrame(probe_rows, "text string")
    res = {r.text: r.maybe_member for r in bloom_probe(spark, store, probe).collect()}
    # Bloom guarantees: every streamed payload reports member
    assert all(res[t] for t in seen)
    # unseen probes: mostly negative (fp possible but bounded)
    fp = sum(1 for i in range(50) if res[f"never-seen-{i}"])
    assert fp <= 10, fp

    # replay under DIFFERENT batching (fresh checkpoint, all files in
    # one trigger): OR-merge idempotence keeps the answers identical
    run_bloom_stream(
        spark, str(src), store, str(tmp_path / "bloom_ckpt2"),
        max_files_per_trigger=10,
    )
    res2 = {r.text: r.maybe_member for r in bloom_probe(spark, store, probe).collect()}
    assert res2 == res


def test_stream_quantile_sketch_matches_batch(spark, tmp_path):
    from pdftotext_spark.operators.sketches import qsketch_quantile
    from pdftotext_spark.streaming.sketches import (
        qsketch_stream_table,
        run_qsketch_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = tmp_path / "qsrc"
    src.mkdir()
    vals = []
    for f in range(3):
        rows = [
            (f * 100 + i, None, i, "view", 0.5 + (f * 100 + i) * 1.37, "{}")
            for i in range(100)
        ]
        vals.extend(r[4] for r in rows)
        stage = tmp_path / f"qstage{f}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        (src / f"f{f}.parquet").symlink_to(part)

    store = str(tmp_path / "qstore")
    run_qsketch_stream(spark, str(src), store, str(tmp_path / "qckpt"))
    table = [r.asDict() for r in qsketch_stream_table(spark, store).collect()]
    assert sum(r["cnt"] for r in table) == len(vals)

    # merged-table == one-shot batch sketch over the same values (the
    # pin the CMS/HLL/Bloom streaming twins all carry)
    from pdftotext_spark.operators.sketches import (
        qsketch_bucket_col,
        qsketch_table_from_hist,
    )
    from pyspark.sql import functions as SF_

    one_shot_hist = (
        spark.createDataFrame([(v,) for v in vals], "value double")
        .filter(SF_.col("value") > 0)
        .select(qsketch_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(SF_.count("*").cast("long").alias("cnt"))
    )
    one_shot = sorted(
        (r.asDict() for r in qsketch_table_from_hist(one_shot_hist).collect()),
        key=lambda r: r["bucket"],
    )
    assert sorted(table, key=lambda r: r["bucket"]) == one_shot

    # estimate within the 2x bucket bound of the true rank statistic
    import math

    srt = sorted(vals)
    true_med = srt[max(1, math.ceil(0.5 * len(srt))) - 1]
    est = qsketch_quantile(table, 0.5)
    assert est / 2 <= true_med <= est * 1.05, (est, true_med)

    # replay under the same lineage: no double counting
    run_qsketch_stream(spark, str(src), store, str(tmp_path / "qckpt"))
    table2 = [r.asDict() for r in qsketch_stream_table(spark, store).collect()]
    assert sum(r["cnt"] for r in table2) == len(vals)
