"""Hypothesis property tests for the corpus operators: the Arrow
gopher kernel must track the Column formulation byte-for-byte over
adversarial text (unicode, repeated/empty/multi-space tokens), and
hash-based sampling must be a pure function of (id, salt) with exact
per-stratum boundaries."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.operators import cleaning as cl
from mfdb_hafro_etl_spark.operators import sampling as sp

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# words heavy on repetition + symbols + CJK so split/regex/length
# semantics get exercised across the ascii boundary
_word = st.sampled_from(["a", "bb", "a", "x!y", "@", "数据", "", "spark"])
_text = st.lists(_word, min_size=0, max_size=30).map(" ".join)


@given(texts=st.lists(_text, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_gopher_kernel_equals_column_everywhere(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    col_side = {
        r["doc_id"]: (r["n"], r["ttr"], r["tb"], r["sy"])
        for r in df.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("n"),
            cl.type_token_ratio("text").alias("ttr"),
            cl.top_bigram_fraction("text").alias("tb"),
            cl.symbol_word_ratio("text").alias("sy"),
        ).collect()
    }
    kernel_side = {
        r["doc_id"]: (r["n_tokens"], r["ttr"], r["top_bigram"], r["sym_ratio"])
        for r in cl.gopher_metrics_table(df, "doc_id", "text").collect()
    }
    assert kernel_side == col_side


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True),
    rate=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    salt=st.sampled_from(["", "v1", "mix"]),
)
@settings(**_SETTINGS)
def test_stratified_matches_python_hash_reference(spark, ids, rate, salt):
    """Membership must equal the documented md5 arithmetic exactly —
    the property the DuckDB oracle (and any other engine) relies on."""
    import hashlib

    def ref_unit(i: int) -> float:
        h = hashlib.md5((salt + str(i)).encode()).hexdigest()
        return int(h[:15], 16) / float(16**15)

    df = spark.createDataFrame([(i, "s") for i in ids], "id LONG, src STRING")
    got = {
        r["id"]
        for r in sp.stratified_sample(df, "id", "src", {"s": rate}, salt=salt).collect()
    }
    want = {i for i in ids if ref_unit(i) < rate}
    assert got == want


@given(texts=st.lists(_text, min_size=1, max_size=15))
@settings(**_SETTINGS)
def test_redact_pii_is_idempotent(spark, texts):
    """Redacting already-redacted text must be a no-op (tokens don't
    match any PII pattern) — the safety property for re-run jobs."""
    df = spark.createDataFrame(
        [(i, t + " a@b.co 12-345-678-9012 1.2.3.4") for i, t in enumerate(texts)],
        "id INT, text STRING",
    )
    once = df.select("id", cl.redact_pii("text").alias("r"))
    twice = once.select("id", cl.redact_pii("r").alias("r"))
    assert {(r["id"], r["r"]) for r in once.collect()} == {
        (r["id"], r["r"]) for r in twice.collect()
    }


# --------------------------------------------- connected components
_edge = st.tuples(
    st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=40)
)


@given(edges=st.lists(_edge, min_size=1, max_size=60))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_clusters_matches_union_find(spark, edges):
    """duplicate_clusters (min-label propagation + pointer jumping)
    must agree with a plain union-find on arbitrary random graphs —
    self-loops, duplicate edges, stars, chains, whatever hypothesis
    throws. The reference implementation is ~10 lines of pure Python,
    so disagreement localizes to the distributed algorithm."""
    from mfdb_hafro_etl_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a BIGINT, id_b BIGINT"
    )
    # driver_max_edges=0 forces the distributed O(log d) loop;
    # the default takes the broadcast-sized driver union-find path —
    # both must agree with the reference
    got = {
        (r.doc_id, r.cluster_id)
        for r in dd.duplicate_clusters(pairs, max_iter=30, driver_max_edges=0).collect()
    }
    got_driver = {
        (r.doc_id, r.cluster_id)
        for r in dd.duplicate_clusters(pairs, max_iter=30).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {(n, find(n)) for n in parent}
    assert got == expect
    assert got_driver == expect


@given(
    texts=st.lists(_text, min_size=1, max_size=25),
    n=st.sampled_from([2, 3, 4]),
)
@settings(**_SETTINGS)
def test_shingles_regex_equals_lambda_construction(spark, texts, n):
    """The regexp-lookahead shingle construction (dedup.shingles) must
    reproduce the transform/slice lambda construction exactly —
    including empty tokens from consecutive/leading/trailing spaces
    and null text. The `_text` strategy includes "" words, so joined
    texts contain runs of spaces; nulls are appended explicitly."""
    from mfdb_hafro_etl_spark.operators import dedup as dd
    from mfdb_hafro_etl_spark.operators.text import tokens

    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")

    toks = tokens(F.col("text"))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    reference = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))

    got = {
        r["doc_id"]: (r["new"], r["ref"])
        for r in df.select(
            "doc_id",
            dd.shingles(F.col("text"), n).alias("new"),
            reference.alias("ref"),
        ).collect()
    }
    for doc_id, (new, ref) in got.items():
        assert new == ref, (doc_id, new, ref)


def test_deep_path_graph_converges_in_log_rounds(spark):
    """A 200-edge path graph (diameter 200) must converge through the
    DISTRIBUTED path-halving loop (driver fast path disabled) well
    inside max_iter=30: propagation alone would need ~200 rounds,
    pointer jumping needs ~log2(200) ≈ 8 — this pins the O(log d)
    claim with a graph deeper than hypothesis generates."""
    from mfdb_hafro_etl_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a BIGINT, id_b BIGINT"
    )
    out = dd.duplicate_clusters(pairs, max_iter=30, driver_max_edges=0)
    rows = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert len(rows) == 201
    assert set(rows.values()) == {0}


# adversarial for the single-pass text rewrites: stopwords clean and
# punctuated, empty tokens (consecutive spaces), tabs INSIDE tokens
# (space is the only separator), CJK, marker words of other languages
_qword = st.sampled_from(
    ["the", "a", "of", "in", "el", "und", "x!y", "..", "a.b",
     "", "\tthe", "the\t", "数据", "Aa1", "the.", "-the-"]
)
_qtext = st.lists(_qword, min_size=0, max_size=30).map(" ".join)


@given(texts=st.lists(_qtext, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_text_single_pass_equals_array_formulations(spark, texts):
    """token_count / token_count_bpe / stopword_ratio /
    mean_token_len / lang_scores are single-pass rewrites
    (length-diff + regexp_count) of their original token-array
    formulations — pin value identity on adversarial text."""
    from mfdb_hafro_etl_spark.operators import text as tx

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    toks = F.split(F.col("text"), " ")
    sw = F.array(*[F.lit(w) for w in tx.STOPWORDS])
    pieces = F.split(
        F.regexp_replace(F.col("text"), r"([^\sA-Za-z0-9]+)", r" $1 "), r"\s+"
    )
    def _marker_count(markers):
        marr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))

    lang_legacy = [
        _marker_count(markers).alias(k)
        for k, markers in sorted(tx.LANG_MARKERS.items())
    ]
    legacy = df.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(F.filter(pieces, lambda x: x != "")).alias("bpe"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("swr"),
        (
            F.length(F.concat_ws("", toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("mlen"),
        *lang_legacy,
    )
    new = df.select(
        "doc_id",
        tx.token_count("text").alias("n"),
        tx.token_count_bpe("text").alias("bpe"),
        tx.stopword_ratio("text").alias("swr"),
        tx.mean_token_len("text").alias("mlen"),
        *[v.alias(k) for k, v in sorted(tx.lang_scores("text").items())],
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, legacy.collect()))


@given(
    texts=st.lists(_text, min_size=1, max_size=15),
    n=st.integers(min_value=2, max_value=4),
    min_df=st.integers(min_value=2, max_value=3),
    # small values so the UPPER gate actually trips on a ≤15-doc
    # corpus (the repetitive word pool makes shared grams common);
    # the large value pins the gate-open path
    max_df=st.sampled_from([2, 3, 5, 1000]),
)
@settings(**_SETTINGS)
def test_duplicate_spans_matches_python_reference(spark, texts, n, min_df, max_df):
    """duplicate_spans over adversarial corpora (empty tokens, CJK,
    repeated words) must equal a brute-force Python reference:
    positional n-grams over split(' ') tokens, grams kept when their
    distinct-doc frequency is in [min_df, max_df], adjacent kept
    positions merged into maximal islands. Pins the xxhash64 gram
    keys (equality-only) against the raw-string semantics, with the
    SAME max_df passed to both sides so the upper gate is exercised."""
    from mfdb_hafro_etl_spark.operators import dedup as dd

    def ref_spans(docs):
        gram_docs: dict[tuple, set] = {}
        pos_by_doc: dict[int, list] = {}
        for did, text in docs:
            toks = text.split(" ")
            if len(toks) < n:
                continue
            for p in range(len(toks) - n + 1):
                g = tuple(toks[p : p + n])
                gram_docs.setdefault(g, set()).add(did)
                pos_by_doc.setdefault(did, []).append((p, g))
        out = set()
        for did, pgs in pos_by_doc.items():
            keep = sorted(
                p for p, g in pgs if min_df <= len(gram_docs[g]) <= max_df
            )
            if not keep:
                continue
            start = prev = keep[0]
            count = 1
            for p in keep[1:]:
                if p == prev + 1:
                    prev = p
                    count += 1
                else:
                    out.add((did, start, prev + n - 1, count))
                    start = prev = p
                    count = 1
            out.add((did, start, prev + n - 1, count))
        return out

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in dd.duplicate_spans(
            df, "doc_id", "text", n=n, min_df=min_df, max_df=max_df
        ).collect()
    }
    assert got == ref_spans(docs)


@given(
    probe_keys=st.lists(
        st.one_of(st.integers(min_value=0, max_value=9), st.none()),
        min_size=0,
        max_size=30,
    ),
    hot_keys=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=10),
    cap=st.sampled_from([0, 1, 3, 100]),
)
@settings(**_SETTINGS)
def test_hot_key_anti_join_equals_plain_left_anti(spark, probe_keys, hot_keys, cap):
    """Every regime of the bounded gate (empty / broadcast-local /
    over-cap fallback) must be row-identical to a plain left_anti —
    including null probe keys, which an anti-join always KEEPS."""
    from mfdb_hafro_etl_spark.operators.skew import hot_key_anti_join

    probe = spark.createDataFrame(
        [(i, k) for i, k in enumerate(probe_keys)], "row_id LONG, k LONG"
    )
    hot = spark.createDataFrame([(k,) for k in hot_keys], "k LONG")
    # pass pins= like every in-package caller: the bare-call warning
    # contract is pinned once in test_plan_quality; here (hundreds of
    # hypothesis examples) it would both spam the suite output and
    # leak one persisted key set per over-cap example
    pins: list = []
    got = {
        (r["row_id"], r["k"])
        for r in hot_key_anti_join(
            probe, hot, on=["k"], max_broadcast_keys=cap, pins=pins
        ).collect()
    }
    want = {
        (r["row_id"], r["k"])
        for r in probe.join(hot, on=["k"], how="left_anti").collect()
    }
    for p_ in pins:
        p_.unpersist()
    assert got == want


@given(
    points=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=0,
        max_size=25,
    ),
    intervals=st.lists(
        st.tuples(
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
            st.floats(min_value=0.0, max_value=2e3, allow_nan=False, width=32),
        ),
        min_size=0,
        max_size=15,
    ),
    bin_width=st.sampled_from([1.0, 37.5, 1000.0]),
    salt=st.sampled_from([None, 1, 4]),
)
@settings(**_SETTINGS)
def test_range_join_binned_equals_between_join(
    spark, points, intervals, bin_width, salt
):
    """range_join_binned must be row-identical to the naive BETWEEN
    join for ANY bin width and salt (the bins/salt are pure physical
    layout): negative values, zero-width intervals, and boundary
    equality (p == lo, p == hi, both inclusive) included. Pins the
    salt-probe rewrite and the auto-salt path against semantics."""
    from mfdb_hafro_etl_spark.operators.joins import range_join_binned

    pts = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pt_id LONG, p DOUBLE"
    )
    ivs = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        "iv_id LONG, lo DOUBLE, hi DOUBLE",
    )
    got = {
        (r["pt_id"], r["iv_id"])
        for r in range_join_binned(
            pts, ivs, point_col="p", lo_col="lo", hi_col="hi",
            bin_width=bin_width, salt=salt,
        ).select("pt_id", "iv_id").collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, w) in enumerate(intervals)
        if lo <= p <= lo + w
    }
    assert got == want


@given(
    large=st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=30),
    small=st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=8),
    buckets=st.sampled_from([1, 3, 16]),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, large, small, buckets):
    """salted_join output must be row-identical to the unsalted
    equi-join for any bucket count — including duplicate keys on
    both sides (the fan-out case where a salting bug would drop or
    duplicate matches)."""
    from mfdb_hafro_etl_spark.operators.skew import salted_join

    l = spark.createDataFrame(
        [(i, k) for i, k in enumerate(large)], "l_id LONG, k LONG"
    )
    s = spark.createDataFrame(
        [(j, k) for j, k in enumerate(small)], "s_id LONG, k LONG"
    )
    got = sorted(
        (r["l_id"], r["s_id"])
        for r in salted_join(l, s, on=["k"], salt_from=["k"], buckets=buckets).collect()
    )
    want = sorted(
        (i, j) for i, lk in enumerate(large) for j, sk in enumerate(small) if lk == sk
    )
    assert got == want


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=20
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_merge_asof_reference(spark, left, right):
    """The union+window as-of construction must reproduce backward
    merge_asof semantics exactly: per left row, the LATEST right row
    with right.on <= left.on in the same group — inclusive at equal
    timestamps, null when no right row precedes, groups independent.
    Right-side (by, on) ties are collapsed upstream (documented
    contract), so the reference is deterministic."""
    from mfdb_hafro_etl_spark.operators.joins import asof_join

    # unique (g, ts) on the right: the operator documents arbitrary
    # tie resolution, so the property avoids ties by construction
    right = list({(g, t): None for g, t in right}.keys())
    l = spark.createDataFrame(
        [(i, g, float(t)) for i, (g, t) in enumerate(left)],
        "l_id LONG, g LONG, ts DOUBLE",
    )
    r = spark.createDataFrame(
        [(g, float(t), 100 * g + t) for g, t in right],
        "g LONG, ts DOUBLE, v LONG",
    )
    got = {
        r_["l_id"]: r_["v_asof"]
        for r_ in asof_join(
            l, r, on="ts", by=["g"], value_cols=["v"]
        ).collect()
    }
    want = {}
    for i, (g, t) in enumerate(left):
        matches = [(rt, 100 * rg + rt) for rg, rt in right if rg == g and rt <= t]
        want[i] = max(matches)[1] if matches else None
    assert got == want


# --------------------------------------------- URL canonicalization
# adversarial URL parts: case noise, stacked www, tracking + real
# params in random order, default/explicit ports, slash runs,
# fragments, userinfo
_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_host = st.sampled_from(
    ["a.com", "WWW.a.com", "www.www.B.io", "News.Site.org", "x-y.net"]
)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.sampled_from(["", "/", "/p", "/p/q/", "//p//q", "/CaseS"])
_params = st.lists(
    st.sampled_from(
        ["a=1", "b=2", "z=9", "utm_source=x", "gclid=g", "ref=keep", "ref_src=t"]
    ),
    min_size=0,
    max_size=5,
)
_frag = st.sampled_from(["", "#f", "#frag/with?q"])
_user = st.sampled_from(["", "User:PW@"])


@st.composite
def _url(draw):
    q = "&".join(draw(_params))
    return (
        draw(_scheme) + "://" + draw(_user) + draw(_host) + draw(_port)
        + draw(_path) + (("?" + q) if q else "") + draw(_frag)
    )


@given(urls=st.lists(_url(), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_canonicalize_url_properties(spark, urls):
    """Over adversarial URLs: (1) idempotent — canonical output is a
    fixpoint; (2) fragment-insensitive — the same URL ± fragment maps
    to one key; (3) param-order-insensitive; (4) the kept query
    params are exactly the non-tracking ones."""
    df = spark.createDataFrame([(u,) for u in urls], "u STRING")
    c1 = df.select(
        F.col("u"), cl.canonicalize_url("u").alias("c")
    )
    rows = c1.collect()
    # idempotence
    twice = c1.select(cl.canonicalize_url("c").alias("c2")).collect()
    assert [r["c"] for r in rows] == [r["c2"] for r in twice]
    for r in rows:
        u, c = r["u"], r["c"]
        # fragment never survives, tracking params never survive
        assert "#" not in c
        assert "utm_" not in c and "gclid" not in c and "ref_src" not in c
        # functional params always survive
        for p in ("a=1", "b=2", "z=9", "ref=keep"):
            assert (p in u.split("#")[0]) == (p in c)
    # order-insensitivity: shuffle the params of each url -> same key
    import re as _re

    def perm(u):
        base, sep, rest = u.partition("?")
        if not sep:
            return u
        q, _h, frag = rest.partition("#")
        parts = q.split("&")
        return base + "?" + "&".join(reversed(parts)) + (_h + frag)

    df2 = spark.createDataFrame([(perm(u),) for u in urls], "u STRING")
    c2 = [r[0] for r in df2.select(cl.canonicalize_url("u")).collect()]
    assert c2 == [r["c"] for r in rows]
