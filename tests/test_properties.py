"""Property-based tests (hypothesis) over the pure schema layer — the
reference pins behavior with a single doctest fixture; these check the
derivation rules hold for arbitrary well-formed inputs."""

import string

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ringo_spark.extractor import (
    dim_column_name, extract_dependencies, extract_dimension_tables,
    extract_fact_table, extracted_fact_table_name, topo_order,
)
from ringo_spark.model import (
    Column, DimTime, DimVal, Fact, FactColumn, FactCount, FactSum, NoDimId,
    Nullable, Settings, Table, TimeUnit, UniqueKey,
)
from ringo_spark.validator import make_env, validate_env

ident = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@st.composite
def envs(draw):
    """A well-formed (table, fact) pair: a time column, K dim-value columns
    spread over D dims, M measure columns."""
    n_dims = draw(st.integers(1, 3))
    dims = draw(st.lists(ident, min_size=n_dims, max_size=n_dims, unique=True))
    dim_cols = []
    fact_cols = [FactColumn("at", DimTime()), FactColumn("site", NoDimId())]
    for d in dims:
        for i in range(draw(st.integers(1, 3))):
            cname = f"{d}_c{i}"
            dim_cols.append(Column(cname, "text"))
            fact_cols.append(FactColumn(cname, DimVal(d)))
    n_measures = draw(st.integers(0, 2))
    measure_cols = [Column(f"m{i}", "integer") for i in range(n_measures)]
    fact_cols += [FactColumn(f"m{i}_sum", FactSum(f"m{i}"))
                  for i in range(n_measures)]
    fact_cols.append(FactColumn("n", FactCount()))
    table = Table("src", [Column("at", "timestamp", Nullable.NOT_NULL),
                          Column("site", "integer", Nullable.NOT_NULL)]
                  + dim_cols + measure_cols)
    unit = draw(st.sampled_from(list(TimeUnit)))
    fact = Fact("f", "src", fact_cols)
    env = make_env([table], [fact], Settings(time_unit=unit),
                   {"text": "'x'", "integer": "-1", "timestamp": "'e'"})
    return env, fact, dims, unit


@given(envs())
@settings(max_examples=50, deadline=None)
def test_dimension_tables_invariants(case):
    env, fact, dims, _ = case
    tables = extract_dimension_tables(env, fact)
    assert [t.name for t in tables] == sorted(f"dim_{d}" for d in dims)
    for t in tables:
        # surrogate key first, everything NOT NULL, PK + natural unique key
        assert t.columns[0].name == "id" and t.columns[0].type == "serial"
        assert all(c.nullable == Nullable.NOT_NULL for c in t.columns)
        uk = [c for c in t.constraints if isinstance(c, UniqueKey)][0]
        assert list(uk.columns) == [c.name for c in t.columns[1:]]


@given(envs())
@settings(max_examples=50, deadline=None)
def test_fact_table_invariants(case):
    env, fact, dims, unit = case
    t = extract_fact_table(env, fact)
    assert t.name == f"fact_f_by_{unit.unit_name}"
    names = [c.name for c in t.columns]
    # time id first, one FK per dim, grain unique key covers time+site+FKs
    assert names[0] == f"at_{unit.unit_name}_id"
    for d in dims:
        assert f"{d}_id" in names
    uk = [c for c in t.constraints if isinstance(c, UniqueKey)][0]
    assert set(uk.columns) == {names[0], "site"} | {f"{d}_id" for d in dims}
    assert all(c.nullable == Nullable.NOT_NULL for c in t.columns)


@given(envs())
@settings(max_examples=50, deadline=None)
def test_dependencies_topo_consistency(case):
    env, fact, dims, unit = case
    deps = extract_dependencies(env, fact)
    fact_table = f"fact_f_by_{unit.unit_name}"
    assert set(deps) == {fact_table} | {f"dim_{d}" for d in dims}
    order = topo_order(deps)
    for d in dims:
        assert order.index(f"dim_{d}") < order.index(fact_table)


@given(ident, ident)
def test_dim_column_name_strip(dim, rest):
    # strips exactly one leading "<dim>_": round-trips for prefixed names
    assert dim_column_name(dim, f"{dim}_{rest}") == rest
    # names not carrying the prefix pass through unchanged
    if not rest.startswith(dim + "_"):
        assert dim_column_name(dim, rest) == rest


@given(st.dictionaries(ident, ident, min_size=1, max_size=5), ident)
def test_type_default_prefix_lookup(defaults, coltype):
    from ringo_spark.model import Env

    env = Env([], [], Settings(), defaults)
    matching = sorted(k for k in defaults if coltype.startswith(k))
    try:
        got = env.type_default_for(coltype)
        assert matching and got == defaults[matching[0]]
    except KeyError:
        assert not matching


@given(st.lists(st.tuples(ident, st.lists(ident, max_size=3)), max_size=6))
def test_topo_order_is_valid(pairs):
    deps = {name: list(ds) for name, ds in pairs}
    try:
        order = topo_order(deps)
    except ValueError:
        return  # cycles are allowed to raise
    for name, ds in deps.items():
        for d in ds:
            if d in deps:
                assert order.index(d) < order.index(name)


def test_segmented_ema_equals_monolithic_fold_on_random_data(spark, tmp_path):
    """Property: the segmented affine fold equals the monolithic EMA for
    arbitrary event layouts (random users, times spanning many segments,
    duplicate timestamps)."""
    import datetime as dt
    import math
    import random

    from ringo_spark.operators.tpch import (
        user_value_ema_df, user_value_ema_segmented_df,
    )

    rng = random.Random(20260813)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(1, 8):
        for _ in range(rng.randint(1, 60)):
            sec = rng.randint(0, 86400 * 20)       # spans ~20 day-segments
            rows.append((eid, t0 + dt.timedelta(seconds=sec), uid,
                         "E", round(rng.uniform(0, 100), 2), "{}"))
            eid += 1
    sf = str(tmp_path / "ema_prop")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string").write.parquet(f"{sf}/events.parquet")

    plain = {r.user_id: (r.n_events, r.ema)
             for r in user_value_ema_df(spark, sf).collect()}
    seg = {r.user_id: (r.n_events, r.ema)
           for r in user_value_ema_segmented_df(spark, sf).collect()}
    assert set(plain) == set(seg)
    for uid in plain:
        assert plain[uid][0] == seg[uid][0]
        assert math.isclose(plain[uid][1], seg[uid][1],
                            rel_tol=1e-9, abs_tol=1e-6), uid


# --- multimodal codec round trips (pure functions, no Spark) -----------------


@given(st.integers(1, 12), st.integers(1, 9), st.data())
@settings(max_examples=40, deadline=None)
def test_png_encode_decode_round_trip(w, h, data):
    """encode_png_rgb -> decode_png_pixels is the identity for arbitrary
    pixel buffers and dims (the decoder also handles filtered scanlines,
    pinned by the closed-form multimodal_pixels oracle)."""
    from ringo_spark.operators.multimodal import (
        decode_png_pixels, encode_png_rgb,
    )

    px = bytes(data.draw(st.lists(st.integers(0, 255),
                                  min_size=w * h * 3, max_size=w * h * 3)))
    w2, h2, px2 = decode_png_pixels(encode_png_rgb(w, h, px))
    assert (w2, h2, px2) == (w, h, px)


@given(st.integers(1, 12), st.integers(1, 9), st.integers(1, 6),
       st.integers(1, 6), st.data())
@settings(max_examples=40, deadline=None)
def test_nearest_resize_properties(w, h, rw, rh, data):
    """Resize output has exactly rw*rh*3 bytes; every output pixel equals
    its gathered source pixel; same-size resize is the identity."""
    from ringo_spark.operators.multimodal import nearest_resize

    px = bytes(data.draw(st.lists(st.integers(0, 255),
                                  min_size=w * h * 3, max_size=w * h * 3)))
    out = nearest_resize(px, w, h, rw, rh)
    assert len(out) == rw * rh * 3
    for y in range(rh):
        for x in range(rw):
            sk = ((y * h // rh) * w + (x * w // rw)) * 3
            tk = (y * rw + x) * 3
            assert out[tk:tk + 3] == px[sk:sk + 3]
    assert nearest_resize(px, w, h, w, h) == px


@given(st.integers(0, 500), st.integers(1, 5))
@settings(max_examples=30, deadline=None)
def test_video_container_sampling_round_trip(doc_id, every_n):
    """The container walk finds exactly the 0, n, 2n... frames and each
    sampled frame decodes to the closed-form pixels."""
    from ringo_spark.operators.multimodal import (
        _frame_pixel, _video_n_frames, encode_video, sample_video_frames,
    )

    frames = sample_video_frames(encode_video(doc_id), every_n)
    n = _video_n_frames(doc_id)
    assert [f for f, *_ in frames] == list(range(0, n, every_n))
    for f, w, h, mean_px, p00 in frames:
        assert p00 == _frame_pixel(doc_id, f, 0)
        total = sum(_frame_pixel(doc_id, f, k) for k in range(w * h * 3))
        assert mean_px == round(total / (w * h * 3), 6)


@given(st.integers(0, 2000))
@settings(max_examples=30, deadline=None)
def test_wav_pcm_decode_round_trip(doc_id):
    from ringo_spark.operators.multimodal import (
        _wav_n_samples, _wav_sample, decode_wav_samples, encode_wav_pcm,
    )

    n, mean_amp, peak, s0 = decode_wav_samples(encode_wav_pcm(doc_id))
    assert n == _wav_n_samples(doc_id)
    assert s0 == _wav_sample(doc_id, 0)
    assert peak == max(abs(_wav_sample(doc_id, i)) for i in range(n))


def test_bpe_merge_fold_matches_reference_merge(spark):
    """Property: the SQL-function array fold implementing greedy
    left-to-right non-overlapping BPE merging equals the canonical
    pure-Python merge on arbitrary symbol sequences — including the
    overlap traps (runs of the merged pair, pair halves embedded in
    longer symbols, merges at either end)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ringo_spark.operators.text import _merge_fold

    sym = st.sampled_from(["a", "b", "ab", "ba", "aa", "x", "xa"])
    seqs = st.lists(st.lists(sym, min_size=0, max_size=8),
                    min_size=1, max_size=6)

    def py_merge(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    @settings(max_examples=12, deadline=None)
    @given(seqs, st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"),
                                  ("ab", "a"), ("x", "xa")]))
    def check(symlists, pair):
        a, b = pair
        df = spark.createDataFrame([(i, s) for i, s in enumerate(symlists)],
                                   "i INT, syms ARRAY<STRING>")
        got = {r.i: list(r.m) for r in
               df.select("i", _merge_fold(F.col("syms"), a, b)
                         .alias("m")).collect()}
        want = {i: py_merge(s, a, b) for i, s in enumerate(symlists)}
        assert got == want

    check()
