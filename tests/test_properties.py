"""Property-based tests (hypothesis) for engine invariants (SURVEY §5)."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.functions import winnowing_fingerprints
from rag_vertex_ai_vector_search_spark.operators import knn_search, merge_by_key

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)

def _session():
    from rag_vertex_ai_vector_search_spark.session import get_spark

    return get_spark("engine-tests", extra_confs={
        "spark.sql.shuffle.partitions": "8",
    })



@SETTINGS
@given(
    base=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 1000)),
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    ),
    updates=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 1000)),
        min_size=1, max_size=15, unique_by=lambda t: t[0],
    ),
)
def test_merge_properties(spark, base, updates):
    b = spark.createDataFrame(base, "k long, v long")
    u = spark.createDataFrame(updates, "k long, v long")
    merged = merge_by_key(b, u, key="k")
    got = {r.k: r.v for r in merged.collect()}
    expected = dict(base)
    expected.update(dict(updates))
    assert got == expected  # update wins, insert appears, others pass through
    twice = {r.k: r.v for r in merge_by_key(merged, u, key="k").collect()}
    assert twice == got  # idempotent


@SETTINGS
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 999), st.integers(0, 4)),
        min_size=5, max_size=60, unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 8),
    per_crowd=st.integers(1, 3),
)
def test_crowding_invariant(spark, scores, k, per_crowd):
    """At most per_crowding_k results share a crowding attribute in any
    top-k (FIXTURES.md invariant; setup_vector_search.py:65-67)."""
    index = spark.createDataFrame(
        [(i, [float(i % 7), float(g)], str(g)) for i, g in scores],
        "vec_id long, embedding array<double>, grp string",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.5])], "query_id long, query_vector array<double>"
    )
    out = knn_search(
        index, queries, k=k, per_crowding_k=per_crowd, crowding_col="grp",
        method="fold",
    ).collect()
    assert len(out) <= k
    counts = {}
    for r in out:
        counts[r.grp] = counts.get(r.grp, 0) + 1
    assert not counts or max(counts.values()) <= per_crowd
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


@SETTINGS
@given(
    prefix=st.lists(words, min_size=0, max_size=6),
    shared=st.lists(words, min_size=4, max_size=10),
    suffix=st.lists(words, min_size=0, max_size=6),
)
def test_winnowing_guarantee(spark, prefix, shared, suffix):
    """Docs sharing a substring of length >= k + w - 1 (k=5, w=4 -> 8
    chars) must share at least one fingerprint."""
    shared_text = " ".join(shared)
    if len(shared_text) < 8:
        return
    a = (" ".join(prefix) + " " + shared_text).strip()
    b = (shared_text + " " + " ".join(suffix)).strip()
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnowing_fingerprints("text", k=5, w=4).alias("fp")
        ).collect()
    }
    assert fps[0] & fps[1]


# -- codec round-trip properties (no Spark; pure numpy + stdlib) ----------

import numpy as np  # noqa: E402

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full


arr_shapes = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=12, deadline=None)
@given(shape=arr_shapes, seed=st.integers(0, 2**31 - 1),
       ftype=st.integers(0, 4), color=st.booleans())
def test_png_roundtrip_property(shape, seed, ftype, color):
    """encode_png -> _decode_png is the identity for ANY uint8 image
    under every PNG row filter."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _decode_png,
        encode_png,
    )

    rng = np.random.RandomState(seed)
    full = shape + ((3,) if color else ())
    img = rng.randint(0, 256, size=full, dtype=np.uint8)
    assert np.array_equal(_decode_png(encode_png(img, filter_type=ftype)), img)


@settings(max_examples=8, deadline=None)
@given(shape=arr_shapes, seed=st.integers(0, 2**31 - 1), color=st.booleans())
def test_jpeg_q100_roundtrip_property(shape, seed, color):
    """At quality=100 the JPEG pipeline's only loss is DCT float
    rounding: error is bounded by a few counts for ANY content."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.RandomState(seed)
    full = shape + ((3,) if color else ())
    img = rng.randint(0, 256, size=full, dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), sampwidth=st.sampled_from([1, 2, 4]),
       channels=st.integers(1, 2), n=st.integers(1, 500))
def test_wav_roundtrip_property(seed, sampwidth, channels, n):
    """WAV PCM write -> decode_audio recovers samples within the
    sample-width quantization step."""
    import io
    import wave

    from rag_vertex_ai_vector_search_spark.multimodal import decode_audio

    rng = np.random.RandomState(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, channels))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        if sampwidth == 1:
            raw = ((x * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = (x * 32767).clip(-32768, 32767).astype("<i2").tobytes()
        else:
            raw = (x * 2147483647).clip(-2**31, 2**31 - 1).astype("<i4").tobytes()
        w.writeframes(raw)
    samples, sr = decode_audio(buf.getvalue())
    assert sr == 8000 and samples.shape == (n, channels)
    step = {1: 1 / 128, 2: 1 / 32768, 4: 1 / 2147483648}[sampwidth]
    assert np.abs(samples - x).max() <= 2 * step + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    shape=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    seed=st.integers(0, 2**31 - 1),
    palette_size=st.integers(1, 256),
    interlace=st.booleans(),
)
def test_gif_roundtrip_property(shape, seed, palette_size, interlace):
    """Any gray raster whose values fit one palette survives GIF
    encode->decode bit-exactly, interlaced or not."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.multimodal.gif import (
        decode_gif, encode_gif,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, palette_size, size=shape, dtype=np.uint8)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == (*shape, 3)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 1], img)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 9000),
    channels=st.integers(1, 2),
    bps=st.sampled_from([8, 16]),
    tonal=st.booleans(),
)
def test_flac_roundtrip_property(seed, n, channels, bps, tonal):
    """Any in-range signal (noise or tonal, mono or stereo, crossing
    frame boundaries) survives FLAC encode->decode losslessly."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.multimodal.flac import (
        decode_flac, encode_flac,
    )

    rng = np.random.default_rng(seed)
    hi = (1 << (bps - 1)) - 1
    if tonal:
        t = np.arange(n * channels).reshape(n, channels)
        sig = (hi * 0.3 * np.sin(t / 7.0)).astype(np.int32)
    else:
        sig = rng.integers(-hi - 1, hi, size=(n, channels), dtype=np.int32)
    out, sr, got_bps = decode_flac(encode_flac(sig, bps=bps))
    assert (sr, got_bps) == (8000, bps)
    assert np.array_equal(out, sig)


def _psl_reference(host, rules):
    """Pure-Python publicsuffix.org algorithm: the spec as literally
    as possible, independent of the Spark/SQL implementations."""
    if not host:
        return host
    labels = host.lower().split(".")
    exc_ps = None
    best = 0
    for raw in rules:
        rule = raw.lower()
        if rule.startswith("!"):
            r = rule[1:].split(".")
            if labels[-len(r):] == r:
                exc_ps = len(r) - 1
        elif rule.startswith("*."):
            r = rule[2:].split(".")
            if len(labels) >= len(r) + 1 and labels[-len(r):] == r:
                best = max(best, len(r) + 1)
        else:
            r = rule.split(".")
            if labels[-len(r):] == r:
                best = max(best, len(r))
    ps = exc_ps if exc_ps is not None else max(best, 1)
    if len(labels) <= ps:
        return host.lower()
    return ".".join(labels[-(ps + 1):])


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["www", "a", "blog", "x1", "sub", "example", "co", "uk",
                 "kawasaki", "jp", "city", "ck", "github", "io", "k12",
                 "ca", "us", "com", "au", "foo"]
            ),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_psl_spark_matches_reference_algorithm(host_labels):
    """Random hosts assembled from PSL-relevant labels: the Spark
    broadcast-join implementation must agree with a literal
    pure-Python transcription of the published algorithm."""
    from rag_vertex_ai_vector_search_spark.functions.psl import (
        PSL_SNAPSHOT,
        with_registrable_domain,
    )

    spark = _session()
    hosts = [".".join(ls) for ls in host_labels]
    got = {
        r.host: r.domain
        for r in with_registrable_domain(
            spark.createDataFrame([(h,) for h in hosts], "host string"),
            "host",
        ).collect()
    }
    for h in hosts:
        assert got[h] == _psl_reference(h, PSL_SNAPSHOT), h


@given(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=20, deadline=None)
def test_cms_one_sided_bound_property(counts):
    """For ANY multiset: CMS never underestimates, and is exact when
    width is generous."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_point_estimate,
        cms_sketch,
    )

    spark = _session()
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "w string")
    items = spark.createDataFrame(
        [(w,) for w in counts], "item string"
    )
    tight = {r.item: r.est for r in cms_point_estimate(
        cms_sketch(df, "w", depth=3, width=8),
        items, depth=3, width=8).collect()}
    wide = {r.item: r.est for r in cms_point_estimate(
        cms_sketch(df, "w", depth=3, width=1 << 14),
        items, depth=3, width=1 << 14).collect()}
    for w, n in counts.items():
        assert tight[w] >= n, (w, tight[w], n)
        assert wide[w] == n, (w, wide[w], n)


@given(st.integers(min_value=1, max_value=400))
@settings(max_examples=10, deadline=None)
def test_hll_merge_idempotent_property(n):
    """Merging a sketch with ITSELF changes nothing (max-fold
    idempotence) -- the property that makes at-least-once streaming
    delivery safe."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        hll_merge,
        hll_sketch,
    )

    spark = _session()
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    s = hll_sketch(df, "v", p=6)
    twice = hll_merge(s, s)
    a = sorted((r.bucket, r.max_rho) for r in s.collect())
    b = sorted((r.bucket, r.max_rho) for r in twice.collect())
    assert a == b


# ---- r12 operators --------------------------------------------------------


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1),
                  st.integers(0, (1 << 16) - 1)),
        min_size=1, max_size=24, unique=True,
    ),
)
def test_zorder_interleave_is_bijective(spark, vals):
    """z_value on pre-scaled ints is a bijection on [0, 2^bits)^k:
    z_decode recovers exactly the inputs, and distinct inputs get
    distinct keys."""
    from rag_vertex_ai_vector_search_spark.operators.layout import (
        z_decode,
        z_value,
    )

    df = spark.createDataFrame(vals, "x long, y long")
    rows = df.select(
        "x", "y", z_value([F.col("x"), F.col("y")], bits=16).alias("z")
    ).collect()
    assert len({r.z for r in rows}) == len(vals)
    for r in rows:
        assert z_decode(r.z, 2, bits=16) == (r.x, r.y)


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=12),
        min_size=1, max_size=30,
    ),
    n_merges=st.integers(0, 6),
)
def test_wordpiece_encode_is_lossless_segmentation(words, n_merges):
    """Greedy longest-match WordPiece encoding of any in-alphabet word
    is a SEGMENTATION: stripping the '##' continuation prefixes and
    concatenating reproduces the word exactly (no drops, no overlaps),
    for any vocabulary built from an alphabet + trained merges."""
    from collections import Counter

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        _train_wordpiece_driver,
        wordpiece_encode_word,
    )

    counts = Counter(words)
    vocab_rows = [
        (
            " ".join([w[0]] + ["##" + c for c in w[1:]]),
            n,
        )
        for w, n in counts.items()
    ]
    try:
        merges = _train_wordpiece_driver(list(vocab_rows), n_merges)
    except ValueError:
        merges = []  # pairs exhausted: alphabet-only vocab still valid
    tokens = {m[3] for m in merges}
    for w in counts:
        tokens.add(w[0])
        tokens.update("##" + c for c in w[1:])
    init = frozenset(t for t in tokens if not t.startswith("##"))
    cont = frozenset(t[2:] for t in tokens if t.startswith("##"))
    for w in counts:
        toks = wordpiece_encode_word(w, (init, cont))
        assert toks != ["[UNK]"]
        rebuilt = "".join(
            t[2:] if t.startswith("##") else t for t in toks
        )
        assert rebuilt == w
