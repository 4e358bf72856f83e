"""Source connectors: CSV/JSON land on the same declared-schema catalog
cast as Parquet, so population results are identical across formats."""

import pytest

from ringo_spark.catalog import load_catalog
from ringo_spark.model import PopulationMode
from ringo_spark.populate.dimension import dimension_population_df
from ringo_spark.sources.readers import load_mixed_catalog, read_source
from ringo_spark.testbed import EVENTS, EVENTS_ENV, EVENTS_FACT, T_FAR

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def csv_json_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("srcfmt")
    pq = load_catalog(spark, SF, [EVENTS])["events"]
    # write without the internal shadow column; timestamps serialize as text
    clean = pq.select(*[c.name for c in EVENTS.columns])
    csv_dir, json_dir = str(base / "events_csv"), str(base / "events_json")
    clean.coalesce(1).write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(csv_dir)
    clean.coalesce(1).write.option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").json(json_dir)
    return csv_dir, json_dir


def test_csv_json_match_parquet(spark, csv_json_dirs):
    csv_dir, json_dir = csv_json_dirs
    pq = load_catalog(spark, SF, [EVENTS])["events"]
    want = {tuple(r) for r in pq.select("event_id", "user_id", "event_type",
                                        "value").collect()}
    for fmt, path in (("csv", csv_dir), ("json", json_dir)):
        df = read_source(spark, EVENTS, path, fmt,
                         options={"timestampFormat":
                                  "yyyy-MM-dd HH:mm:ss.SSSSSS"})
        got = {tuple(r) for r in df.select("event_id", "user_id", "event_type",
                                           "value").collect()}
        assert got == want, fmt
        # timestamps survive the round trip at second granularity
        assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_population_source_agnostic(spark, csv_json_dirs):
    csv_dir, _ = csv_json_dirs
    cat = load_mixed_catalog(
        spark,
        {"events": {"path": csv_dir, "fmt": "csv",
                    "options": {"timestampFormat":
                                "yyyy-MM-dd HH:mm:ss.SSSSSS"}}},
        [EVENTS])
    dim_csv = dimension_population_df(EVENTS_ENV, EVENTS_FACT,
                                      "dim_event_type", cat, time_upper=T_FAR)
    pq_cat = load_catalog(spark, SF, [EVENTS])
    dim_pq = dimension_population_df(EVENTS_ENV, EVENTS_FACT,
                                     "dim_event_type", pq_cat, time_upper=T_FAR)
    assert sorted(map(tuple, dim_csv.collect())) == \
        sorted(map(tuple, dim_pq.collect()))


def test_unsupported_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported source format"):
        read_source(spark, EVENTS, "/nope", "avro")
    with pytest.raises(ValueError, match="jdbc_url"):
        read_source(spark, EVENTS, "events", "jdbc")


def test_read_media_dir_binary_files_decode(spark, tmp_path):
    """binaryFile ingest feeds the real multimodal decoders: PNG files on
    disk read as (path, length, payload) rows whose pixel decode matches
    the closed-form encoder."""
    from ringo_spark.operators.multimodal import (
        _png_dims, decode_png_pixels, encode_png,
    )
    from ringo_spark.sources.readers import read_media_dir

    for doc_id in (3, 7, 11):
        (tmp_path / f"img_{doc_id}.png").write_bytes(encode_png(doc_id))
    (tmp_path / "notes.txt").write_text("not media")

    media = read_media_dir(spark, str(tmp_path), glob="*.png")
    rows = media.collect()
    assert len(rows) == 3  # the .txt was pruned at listing time
    for r in rows:
        doc_id = int(r.path.rsplit("img_", 1)[1].removesuffix(".png"))
        assert r.length == len(bytes(r.payload))
        w, h, _px = decode_png_pixels(bytes(r.payload))
        assert (w, h) == _png_dims(doc_id)


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-order write: with the events fact laid out by
    zorder(user_id, minute), BOTH columns cluster within files — parquet
    footer min-max spans per file cover a fraction of each domain, so a
    filter on either column can skip most files.  A plain time sort
    (the baseline layout) clusters time but leaves every file spanning
    the full user domain."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ringo_spark.catalog import load_catalog
    from ringo_spark.sources.layout import write_zordered
    from ringo_spark.testbed import EVENTS

    ev = (load_catalog(spark, "/root/testdata/sf0.01", [EVENTS])["events"]
          .select("event_id", "user_id",
                  F.floor(F.unix_timestamp("ts") / 60).alias("minute"))
          .where(F.col("user_id").isNotNull()))
    n_files = 8

    def file_spans(path, col):
        spans = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(mx - mn)
        return spans

    zpath = str(tmp_path / "z")
    write_zordered(ev, ["user_id", "minute"], zpath, n_files)
    spath = str(tmp_path / "s")
    (ev.repartitionByRange(n_files, "minute").sortWithinPartitions("minute")
     .write.parquet(spath))

    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    user_domain = hi - lo
    lo, hi = ev.agg(F.min("minute"), F.max("minute")).collect()[0]
    minute_domain = hi - lo

    z_user, z_min = file_spans(zpath, "user_id"), file_spans(zpath, "minute")
    s_user = file_spans(spath, "user_id")
    assert len(z_user) == n_files
    # rows conserved through the layout write
    assert spark.read.parquet(zpath).count() == ev.count()
    # z-order: BOTH dimensions cluster — median per-file span well under
    # the domain (each file covers a 2-D tile, not a full slice)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(z_user) <= 0.6 * user_domain, (z_user, user_domain)
    assert med(z_min) <= 0.6 * minute_domain, (z_min, minute_domain)
    # the single-column baseline cannot skip on user_id: every file
    # spans (almost) the whole user domain
    assert med(s_user) >= 0.9 * user_domain, (s_user, user_domain)


def test_zorder_bits_guard_and_autoscale(spark, tmp_path):
    """r07 ADVICE medium: interleaving must fit a long's 63 VALUE bits.
    At 16 bits x 4 columns the top bit lands on the sign bit (high keys
    range-sort first — Morton order silently broken); at 5+ columns Java
    shiftleft wraps mod 64 and folds high bits onto low positions.  Both
    failures conserve rows, so only an explicit guard can catch them:
    zorder_key raises, and write_zordered auto-scales per-dimension
    resolution to 63 // n_cols and keeps working."""
    from pyspark.sql import functions as F

    from ringo_spark.sources.layout import write_zordered, zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key([F.lit(0).cast("long")] * 4, bits=16)
    # 3 x 21 = 63 is the boundary: still legal
    zorder_key([F.lit(0).cast("long")] * 3, bits=21)

    df = spark.range(2000).select(
        (F.col("id") % 50).alias("a"), (F.col("id") % 31).alias("b"),
        (F.col("id") % 17).alias("c"), (F.col("id") % 7).alias("d"))
    out = str(tmp_path / "z4")
    write_zordered(df, ["a", "b", "c", "d"], out, n_files=4)  # 15 bits/dim
    got = spark.read.parquet(out)
    assert got.count() == 2000
    # keys stayed non-negative end-to-end: every file's sort ordered on
    # a valid Morton key, so each column still clusters (spot check: no
    # file spans the full domain of ALL four columns at once)
    assert set(got.columns) == {"a", "b", "c", "d"}
