"""Property-based invariants for the round-3 pipeline operators:

* pack_token_budget — the Spark bin assignment equals a sequential
  reference pack for ANY token distribution, and bins partition the corpus.
* stratified_sample — membership is a pure function of (id, stratum):
  invariant under repartitioning, and monotone in the fraction.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from buskafkasparkstreaming_spark.operators.packing import pack_token_budget
from buskafkasparkstreaming_spark.operators.sampling import stratified_sample

token_lists = st.lists(
    st.integers(min_value=0, max_value=900), min_size=1, max_size=60
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=token_lists, budget=st.integers(min_value=1, max_value=600))
def test_packing_matches_sequential_reference(spark, tokens, budget):
    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_token_budget(df, "doc_id", "n", budget=budget, num_groups=4)
    got = {
        r["doc_id"]: (r["pack_group"], r["bin_in_group"]) for r in out.collect()
    }
    # driver-side reference: per group in id order, bin = cum_before // budget
    cums: dict[int, int] = {}
    for i, t in sorted(rows):
        g = i % 4
        before = cums.get(g, 0)
        assert got[i] == (g, before // budget), (i, t, budget)
        cums[g] = before + t
    assert len(got) == len(rows)  # bins partition the corpus (no row lost)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50,
        unique=True,
    ),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_stratified_sample_is_partitioning_invariant(spark, ids, frac):
    rows = [(i, "a" if i % 2 else "b") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept1 = {
        r["doc_id"]
        for r in stratified_sample(
            df, "doc_id", "lang", {"a": frac}, default_fraction=0.5
        ).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7), "doc_id", "lang", {"a": frac}, default_fraction=0.5
        ).collect()
    }
    assert kept1 == kept2  # pure function of (id, stratum) — layout-free
    # monotone: a larger fraction keeps a superset of stratum-a rows
    kept_more = {
        r["doc_id"]
        for r in stratified_sample(
            df, "doc_id", "lang", {"a": min(1.0, frac + 0.3)},
            default_fraction=0.5,
        ).collect()
        if r["lang"] == "a"
    }
    assert {i for i in kept1 if i % 2} <= kept_more


word_strat = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
doc_strat = st.lists(word_strat, min_size=1, max_size=17).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(doc_strat, min_size=1, max_size=12),
    chunk_words=st.integers(min_value=1, max_value=5),
)
def test_boilerplate_reassembly_is_lossless(spark, texts, chunk_words):
    """With an unreachable min_docs threshold no chunk is dropped, so
    chunk-split followed by ordered reassembly must reproduce every text
    byte-for-byte — pins chunk boundary arithmetic (the tail chunk, the
    one-word doc, chunk_words=1) independent of the dedup logic."""
    from buskafkasparkstreaming_spark.operators.dedup import (
        remove_boilerplate_chunks,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_chunks(
        df, "doc_id", chunk_words=chunk_words, min_docs=len(texts) + 1
    )
    got = {r.id: (r.clean_text, r.n_dropped) for r in out.collect()}
    assert got == {i: (t, 0) for i, t in rows}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=5, max_size=60,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=20),
)
def test_weighted_sample_is_partitioning_invariant(spark, ids, k):
    """A-ES weighted sample is a pure function of (id, salt): identical
    under repartitioning (= identical on any cluster layout), sized
    min(k, eligible), and monotone — a larger k keeps a superset."""
    from buskafkasparkstreaming_spark.operators.sampling import weighted_sample

    rows = [(i, 1 + (i % 7)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    s1 = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k).collect()}
    s2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), "doc_id", "w", k).collect()
    }
    assert s1 == s2
    assert len(s1) == min(k, len(ids))
    s_more = {
        r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k + 5).collect()
    }
    assert s1 <= s_more


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=token_lists, budget=st.integers(min_value=1, max_value=600))
def test_pack_ffd_invariants(spark, tokens, budget):
    """FFD invariants for ANY token distribution: (a) the Spark result
    equals a sequential FFD reference per group (determinism); (b) no
    non-overflow bin exceeds the budget; (c) FFD never uses more bins
    than the sequential FIRST-FIT baseline (decreasing order can only
    help); (d) bins partition the corpus."""
    from buskafkasparkstreaming_spark.operators.packing import pack_ffd

    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_ffd(df, "doc_id", "n", budget=budget, num_groups=4)
    got = {r["id"]: (r["pack_group"], r["bin_in_group"]) for r in out.collect()}
    assert len(got) == len(rows)

    def ffd_ref(group_rows, decreasing):
        order = (
            sorted(group_rows, key=lambda x: (-x[1], x[0]))
            if decreasing
            else sorted(group_rows)
        )
        caps, assign = [], {}
        for i, t in order:
            if t >= budget:
                assign[i] = len(caps)
                caps.append(-1)  # overflow: nothing fits, not even 0
                continue
            for b, c in enumerate(caps):
                if c >= t:
                    assign[i] = b
                    caps[b] = c - t
                    break
            else:
                assign[i] = len(caps)
                caps.append(budget - t)
        return assign, len(caps)

    for g in range(4):
        grp = [(i, t) for i, t in rows if i % 4 == g]
        if not grp:
            continue
        ref, n_bins = ffd_ref(grp, decreasing=True)
        fill: dict[int, int] = {}
        for i, t in grp:
            assert got[i] == (g, ref[i]), (i, t, budget)
            if t < budget:  # overflow bins are exempt by design
                fill[ref[i]] = fill.get(ref[i], 0) + t
        assert all(v <= budget for v in fill.values())
        _, ff_bins = ffd_ref(grp, decreasing=False)
        assert n_bins <= ff_bins


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=150),
)
def test_plan_compaction_invariants(spark, sizes, budget):
    """plan_compaction (FFD over a lakehouse object inventory) for ANY
    size distribution: (a) placements equal the sequential FFD
    reference per STRING partition (determinism, bins never span
    partitions); (b) no non-overflow bin exceeds the budget; (c)
    already-full objects are untouched singletons; (d) the plan
    partitions the inventory."""
    from buskafkasparkstreaming_spark.operators.packing import (
        plan_compaction,
    )

    parts = ["p_a", "p_b", "p_c"]
    rows = [(parts[i % 3], f"obj{i:03d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "part string, obj string, n long")
    out = plan_compaction(df, "part", "obj", "n", budget=budget)
    got = {(r["part"], r["obj"]): (r["size"], r["bin_in_part"]) for r in out.collect()}
    assert len(got) == len(rows)  # (d): nothing dropped or duplicated

    def ffd_ref(group_rows):
        order = sorted(group_rows, key=lambda x: (-x[1], x[0]))
        caps, assign = [], {}
        for o, t in order:
            if t >= budget:
                assign[o] = len(caps)
                caps.append(-1)  # overflow: nothing fits, not even 0
                continue
            for b, c in enumerate(caps):
                if c >= t:
                    assign[o] = b
                    caps[b] = c - t
                    break
            else:
                assign[o] = len(caps)
                caps.append(budget - t)
        return assign

    for p in parts:
        grp = [(o, s) for (pp, o, s) in rows if pp == p]
        if not grp:
            continue
        ref = ffd_ref(grp)
        fill: dict[int, int] = {}
        members: dict[int, int] = {}
        for o, s in grp:
            assert got[(p, o)] == (s, ref[o]), (p, o, s, budget)
            members[ref[o]] = members.get(ref[o], 0) + 1
            if s < budget:
                fill[ref[o]] = fill.get(ref[o], 0) + s
        assert all(v <= budget for v in fill.values())  # (b)
        for o, s in grp:  # (c): full objects are singleton bins
            if s >= budget:
                assert members[ref[o]] == 1, (p, o, s)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=3, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=14,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7]),
)
def test_prefix_filter_equals_brute_force(spark, docs, threshold):
    """The PPJoin prefix lemma, pinned over RANDOM corpora: the
    prefix-filtered join must return EXACTLY the brute-force Jaccard
    pairs — no false negatives (the lemma), no false positives (the
    verification) — for any token distribution, including corpora that
    are all boilerplate (every prefix token hot) and near-empty docs."""
    from buskafkasparkstreaming_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", k=3, threshold=threshold
        ).collect()
    }

    # driver-side brute force over the SAME shingle definition
    def shingles(text):
        ws = text.split(" ")
        n = len(ws)
        return {
            " ".join(ws[i : i + 3]) for i in range(max(n - 2, 1))
        } if text.strip() else set()

    sh = {i: shingles(t) for i, t in rows}
    want = set()
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= threshold:
                want.add((a, b, round(inter / union, 12)))
    assert got == want, (got - want, want - got)


def _kll_simulate(n: int, kcap: int) -> set[tuple[int, int]]:
    """Direct buffer simulation of the pinned-compaction KLL: items
    (identified by rank) arrive in sorted order; a full level buffer
    promotes its even local positions. Because arrival order is sorted
    order at EVERY level (each compaction emits ascending ranks), the
    pre-compaction sort is the identity."""
    levels: list[list[int]] = []

    def insert(l: int, item: int) -> None:
        while len(levels) <= l:
            levels.append([])
        levels[l].append(item)
        if len(levels[l]) == kcap:
            promoted = levels[l][1::2]  # local positions 2, 4, ..., kcap
            levels[l] = []
            for it in promoted:
                insert(l + 1, it)

    for r in range(1, n + 1):
        insert(0, r)
    return {(r, l) for l, buf in enumerate(levels) for r in buf}


def _kll_closed_form(n: int, kcap: int) -> set[tuple[int, int]]:
    from buskafkasparkstreaming_spark.operators.stats import kll_level_plan

    plan = kll_level_plan(n, kcap)
    out: set[tuple[int, int]] = set()
    for r in range(1, n + 1):
        rmax: int | None = None
        for l, _nl, cl in plan:
            lo = cl * kcap * (1 << l)
            if r % (1 << l) == 0 and r > lo and (rmax is None or r <= rmax):
                out.add((r, l))
            rmax = lo if rmax is None else min(rmax, lo)
    return out


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=0, max_value=3000),
    kcap=st.sampled_from([2, 4, 8, 16, 64]),
)
def test_kll_closed_form_matches_buffer_simulation(n, kcap):
    """The rank closed form IS the deterministic KLL: identical retained
    (rank, level) set to a direct buffer simulation, and weight (2^l)
    conservation — the sketch's total weight is exactly n."""
    sim = _kll_simulate(n, kcap)
    got = _kll_closed_form(n, kcap)
    assert got == sim
    assert sum(1 << l for _r, l in got) == n
    # sketch size bound: < kcap rows per level
    from collections import Counter

    per_level = Counter(l for _r, l in got)
    assert all(c < kcap for c in per_level.values())


def test_kll_sketch_spark_matches_closed_form_and_bounds(spark):
    """kll_sketch on Spark reproduces the closed form, and quantile
    estimates read off the cumulative weight are rank-accurate within
    the top level's weight (the overshoot of a conserved-weight CDF)."""
    import math

    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.stats import (
        kll_level_plan,
        kll_sketch,
    )
    from buskafkasparkstreaming_spark.operators.windows_fn import global_rank

    n, kcap = 1000, 16
    vals = [((i * 7919) % 4001, i) for i in range(n)]  # distinct-ish, unordered
    df = spark.createDataFrame(vals, "v long, id long")
    ranked = global_rank(df, [F.col("v").asc(), F.col("id").asc()], "rn")
    sk = kll_sketch(ranked, "rn", n, kcap=kcap).collect()
    got = {(r["rn"], r["level"]) for r in sk}
    assert got == _kll_closed_form(n, kcap)
    assert sum(r["weight"] for r in sk) == n
    # estimate check: first sketch item with cumw >= ceil(q*n) has true
    # rank within max-weight of the target
    top_w = 1 << max(l for _r, l in got)
    items = sorted((r["rn"], r["weight"]) for r in sk)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        target = math.ceil(q * n)
        cum = 0
        for rn, w in items:
            cum += w
            if cum >= target:
                assert abs(rn - target) <= max(top_w, kcap), (q, rn, target)
                break


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=5, max_size=60,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_stratified_reservoir_invariants(spark, ids, k):
    """Per-stratum A-ES reservoir: partitioning-invariant, exactly
    min(k, stratum size) rows per stratum, and each stratum's selection
    equals a GLOBAL weighted_sample run on that stratum alone (same
    priorities, same salt ⇒ same winners)."""
    from buskafkasparkstreaming_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_per_stratum,
    )

    rows = [(i, 1 + (i % 7), "s" + str(i % 3)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, w int, g string")
    out = weighted_sample_per_stratum(df, "doc_id", "w", "g", k).collect()
    out2 = weighted_sample_per_stratum(
        df.repartition(7), "doc_id", "w", "g", k
    ).collect()
    assert {(r["doc_id"], r["g"]) for r in out} == {
        (r["doc_id"], r["g"]) for r in out2
    }
    by_g: dict[str, set[int]] = {}
    for r in out:
        by_g.setdefault(r["g"], set()).add(r["doc_id"])
    for g, members in by_g.items():
        stratum = df.filter(df.g == g)
        assert len(members) == min(k, stratum.count())
        solo = {
            r["doc_id"]
            for r in weighted_sample(
                stratum, "doc_id", "w", k, salt="wstrat"
            ).collect()
        }
        assert members == solo


def _ref_bpe(word_list: list[str], k: int):
    """Sequential BPE reference: overlap-counting pair frequencies,
    (count desc, pair asc) argmax, left-to-right non-overlapping
    rewrite via Python str.replace — the exact pinned semantics."""
    from collections import Counter

    freq = Counter(w for w in word_list if w)
    corpus = [(" " + " ".join(w) + " ", f) for w, f in sorted(freq.items())]
    merges = []
    for step in range(1, k + 1):
        cnt: Counter = Counter()
        for s, f in corpus:
            syms = s.split()
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        (x, y), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, x, y, x + y, c))
        corpus = [(s.replace(f" {x} {y} ", f" {x}{y} "), f) for s, f in corpus]
    return merges


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_bpe_matches_sequential_reference(spark, docs, k):
    """Distributed BPE merge learning equals the sequential reference
    on arbitrary corpora — same winners, same counts, same order."""
    from buskafkasparkstreaming_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, text string")
    got = [
        (r["step"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in bpe_learn_merges(df, "text", k=k).collect()
    ]
    want = _ref_bpe([w for d in docs for w in d.split(" ")], k)
    assert sorted(got) == sorted(want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=3, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=14,
    ),
    threshold=st.sampled_from([0.2, 0.4, 0.6]),
)
def test_weighted_jaccard_equals_brute_force(spark, docs, threshold):
    """IDF-weighted Jaccard pinned over RANDOM corpora against a
    driver-side brute force with the same shingle definition and the
    same integer weight rule. Buckets are scaled down ((4,4),(2,2)) so
    tiny hypothesis corpora actually exercise the 4x/2x/1x tiers —
    production buckets never trigger below N=16."""
    from buskafkasparkstreaming_spark.operators.dedup import (
        weighted_jaccard_pairs,
    )

    buckets = ((4, 4), (2, 2))
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], round(r["w_jaccard"], 12))
        for r in weighted_jaccard_pairs(
            df, "doc_id", k=3, threshold=threshold, max_df=1000,
            buckets=buckets,
        ).collect()
    }

    def shingles(text):
        ws = text.split(" ")
        n = len(ws)
        return {
            " ".join(ws[i : i + 3]) for i in range(max(n - 2, 1))
        } if text.strip() else set()

    sh = {i: shingles(t) for i, t in rows}
    df_count: dict[str, int] = {}
    for s in sh.values():
        for x in s:
            df_count[x] = df_count.get(x, 0) + 1
    n_docs = sum(1 for s in sh.values() if s)

    def weight(s):
        d = df_count[s]
        for divisor, w in buckets:
            if d * divisor <= n_docs:
                return w
        return 1

    want = set()
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            inter = sum(weight(s) for s in sh[a] & sh[b])
            union = sum(weight(s) for s in sh[a] | sh[b])
            if union and inter / union >= threshold:
                want.add((a, b, round(inter / union, 12)))
    assert got == want, (got - want, want - got)


def test_weighted_minhash_estimates_weighted_jaccard(spark):
    """The replication reduction, end to end on a deterministic corpus:
    two near-identical docs sharing one rare shingle must score a HIGHER
    weighted than plain Jaccard (the IDF boost), and the 32-hash
    replicated-MinHash estimate must land within 0.25 of the exact
    weighted value (the entry's contract bound)."""
    from buskafkasparkstreaming_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        weighted_jaccard_pairs,
        weighted_minhash_signatures,
        weighted_shingles,
    )

    # docs 0 and 1 SHARE a rare block (df=2 -> weight 4) and DIFFER only
    # in boilerplate carried by many other docs (df=10 -> weight 1), so
    # the IDF weighting must score them closer than plain Jaccard does
    rare = "xq zv wk pf jm qt dn rb"
    boiler1 = "the cat sat on the mat and looked at the red door quietly"
    boiler2 = "a dog ran in the park and barked at the tall tree loudly"
    rows = [(0, rare + " " + boiler1), (1, rare + " " + boiler2)]
    rows += [(i, boiler1) for i in range(2, 11)]
    rows += [(i, boiler2) for i in range(11, 20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", k=3, threshold=0.0, max_df=None
        ).collect()
    }
    weighted = {
        (r["id_a"], r["id_b"]): r["w_jaccard"]
        for r in weighted_jaccard_pairs(
            df, "doc_id", k=3, threshold=0.0, buckets=((8, 4), (4, 2))
        ).collect()
    }
    assert weighted[(0, 1)] > plain[(0, 1)]

    wt = weighted_shingles(df, "doc_id", k=3, buckets=((8, 4), (4, 2)))
    sigs = weighted_minhash_signatures(wt, num_hashes=32)
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in lsh_candidate_pairs(sigs, bands=8, rows_per_band=4).collect()
    }
    assert (0, 1) in est, "the high-overlap pair must be an LSH candidate"
    assert abs(est[(0, 1)] - weighted[(0, 1)]) <= 0.25


def test_sketch_ks_approx_tracks_exact_ks(spark, sf_dir):
    """The sketch-backed KS must approximate the exact two-sample KS on
    the same populations: KLL rank error at kcap=64 keeps the CDF-gap
    estimate within a few percent (observed diff 0.004-0.013 at
    sf 0.001-0.01); 0.05 is the alarm bound — a compaction or CDF
    regression lands far outside it."""
    import __spark_entry__ as entrymod

    exact = entrymod.q_ks_two_sample(spark, sf_dir).collect()[0]
    approx = entrymod.sketch_ks_approx(spark, sf_dir).collect()[0]
    assert approx["n1"] == exact["n1"] and approx["n2"] == exact["n2"]
    assert abs(approx["ks_approx"] - exact["ks_stat"]) <= 0.05


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=10
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=12,
    ),
    frac=st.sampled_from([(1, 1), (1, 2), (1, 3)]),
)
def test_tfidf_cosine_equals_brute_force(spark, docs, frac):
    """The sparse tf-idf cosine join equals a driver-side brute force —
    same tokenization, relative df cap, integer IDF-bucket weights, and
    the one float expression — over RANDOM corpora, including all-hot
    vocabularies where the cap drops everything."""
    import math

    from buskafkasparkstreaming_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["dot"], round(r["cosine"], 12))
        for r in tfidf_cosine_pairs(
            df, "doc_id", threshold=0.0, max_df_frac=frac
        ).collect()
    }

    tf: dict[int, dict[str, int]] = {}
    for i, t in rows:
        for w in t.split(" "):
            if w:
                tf.setdefault(i, {})[w] = tf.get(i, {}).get(w, 0) + 1
    n_docs = len(tf)
    dfreq: dict[str, int] = {}
    for terms in tf.values():
        for w in terms:
            dfreq[w] = dfreq.get(w, 0) + 1
    num, den = frac
    keep = {w for w, d in dfreq.items() if d * den <= n_docs * num}

    def weight(w):
        d = dfreq[w]
        return 4 if d * 256 <= n_docs else (2 if d * 16 <= n_docs else 1)

    vec = {
        i: {w: c * weight(w) for w, c in terms.items() if w in keep}
        for i, terms in tf.items()
    }
    want = set()
    ids = sorted(vec)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = set(vec[a]) & set(vec[b])
            if not shared:
                continue
            dot = sum(vec[a][w] * vec[b][w] for w in shared)
            n2a = sum(v * v for v in vec[a].values())
            n2b = sum(v * v for v in vec[b].values())
            cos = float(dot) / math.sqrt(float(n2a) * float(n2b))
            want.add((a, b, dot, round(cos, 12)))
    assert got == want, (got - want, want - got)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    baskets=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=6), min_size=1, max_size=5
        ),
        min_size=1,
        max_size=20,
    ),
    minsup=st.sampled_from([1, 2, 3]),
)
def test_basket_lift_equals_brute_force(spark, baskets, minsup):
    """basket_lift_pairs equals a driver-side reference (distinct items
    per basket, pair supports, exact-integer lift inputs) over random
    basket sets, including duplicate items within a basket."""
    from buskafkasparkstreaming_spark.operators.stats import (
        basket_lift_pairs,
    )

    rows = [(o, p) for o, items in enumerate(baskets) for p in items]
    df = spark.createDataFrame(rows, "o long, p long")
    got = {
        (r["part_a"], r["part_b"], r["c_ab"], r["c_a"], r["c_b"],
         r["n_orders"], round(r["lift"], 12))
        for r in basket_lift_pairs(df, "o", "p", min_support=minsup).collect()
    }

    sets = [set(items) for items in baskets]
    n_orders = len(sets)
    cnt: dict[int, int] = {}
    for s in sets:
        for p in s:
            cnt[p] = cnt.get(p, 0) + 1
    from collections import Counter

    c_ab: Counter = Counter()
    for s in sets:
        ss = sorted(s)
        for x in range(len(ss)):
            for y in range(x + 1, len(ss)):
                c_ab[(ss[x], ss[y])] += 1
    want = {
        (a, b, c, cnt[a], cnt[b], n_orders,
         round(float(c * n_orders) / float(cnt[a] * cnt[b]), 12))
        for (a, b), c in c_ab.items()
        if c >= minsup
    }
    assert got == want, (got - want, want - got)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                   # group
            st.integers(                                    # epoch ms,
                min_value=-2 * 3600_000, max_value=4 * 3600_000
            ),                                              # incl. pre-1970
            st.integers(min_value=-500, max_value=500),    # cents
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_twap_hourly_equals_brute_force(spark, events):
    """twap_hourly equals a driver-side LOCF integral over random event
    sets — duplicate timestamps, hour-straddling and multi-hour
    segments, negative values, NEGATIVE EPOCHS (floor vs truncate hour
    bucketing — Python // is floor, the reference is authoritative),
    and single-event groups included. Also pins the invariant that
    per-(group, hour) weights sum to exactly the covered
    milliseconds."""
    import datetime as dt

    from buskafkasparkstreaming_spark.operators.timeseries import (
        twap_hourly,
    )

    epoch = dt.datetime(1970, 1, 1)
    rows = [
        (i, g, epoch + dt.timedelta(milliseconds=ms), c / 100.0)
        for i, (g, ms, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, grp string, ts timestamp, value double"
    )
    got = {
        (
            r["grp"],
            r["h"],
            r["w_ms"],
            r["num_div"],
            r["num_mod"],
            round(r["twap_cents"], 12),
        )
        for r in twap_hourly(df, "grp", "ts", "value", "event_id").collect()
    }

    # driver-side reference: same (ms, id) order, LOCF segments, hour clamp
    by_grp: dict[str, list[tuple[int, int, int]]] = {}
    for i, (g, ms, c) in enumerate(events):
        by_grp.setdefault(g, []).append((ms, i, c))
    want_acc: dict[tuple[str, int], tuple[int, int]] = {}
    for g, evs in by_grp.items():
        evs.sort()
        for (ms, _i, c), (nxt, _j, _c2) in zip(evs, evs[1:]):
            if nxt <= ms:
                continue
            for h in range(ms // 3600_000, (nxt - 1) // 3600_000 + 1):
                w = min(nxt, (h + 1) * 3600_000) - max(ms, h * 3600_000)
                pw, pn = want_acc.get((g, h), (0, 0))
                want_acc[(g, h)] = (pw + w, pn + c * w)
    # the reference divmod is Python's own floor divmod — exact bigints
    want = {
        (g, h, w, n // w, n % w, round(float(n // w) + float(n % w) / float(w), 12))
        for (g, h), (w, n) in want_acc.items()
    }
    assert got == want, (got - want, want - got)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # minimize dim
            st.integers(min_value=0, max_value=8),   # maximize dim
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_skyline_matches_brute_force(spark, pts):
    """The staircase skyline equals the O(n^2) dominance definition on
    random point sets with heavy duplication (coords in 0..8, so ties on
    one and both dimensions are common — the strictness edge cases)."""
    from buskafkasparkstreaming_spark.operators.windows_fn import skyline_2d

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, cost long, gain long")
    got = {r["id"] for r in skyline_2d(df, "cost", "gain").collect()}
    want = {
        i
        for i, x, y in rows
        if not any(
            bx <= x and by >= y and (bx < x or by > y)
            for _, bx, by in rows
        )
    }
    assert got == want, (sorted(got), sorted(want), rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # user
            st.integers(min_value=0, max_value=40),    # seconds offset
            st.sampled_from(["conv", "a", "b"]),       # type
        ),
        min_size=1,
        max_size=40,
    ),
    window_s=st.sampled_from([5, 15, 100]),
)
def test_attribution_matches_brute_force(spark, events, window_s):
    """attribute_touches equals a sequential per-user reference walk on
    random event streams: same touch->conversion assignment under the
    (ts, id) order, same lookback filter, same credit split, same
    first/last flags (timestamp collisions are frequent by design —
    the id tie-break must resolve them identically)."""
    import datetime as dt

    from buskafkasparkstreaming_spark.operators.windows_fn import (
        attribute_touches,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s), t)
        for i, (u, s, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = attribute_touches(
        df, "user_id", "event_type", "ts", "event_id", "conv", window_s * 1000
    )
    got = {
        (
            r["user_id"],
            r["conv_idx"],
            r["conv_id"],
            r["touch_type"],
            r["n_type"],
            r["n_touches"],
            round(r["linear_credit"], 12),
            r["is_first_touch"],
            r["is_last_touch"],
        )
        for r in out.collect()
    }

    # sequential reference: per user in (ms, id) order
    want = set()
    for u in {r[1] for r in rows}:
        evs = sorted(
            ((int(r[2].timestamp() * 1000), r[0], r[3]) for r in rows if r[1] == u)
        )
        convs = [
            (idx + 1, ms, eid)
            for idx, (ms, eid, t) in enumerate(
                e for e in evs if e[2] == "conv"
            )
        ]
        for conv_idx, cms, cid in convs:
            # a touch belongs to conv_idx iff that conv is the FIRST one
            # after it in (ms, id) order and it passes the lookback
            touches = []
            for ms, eid, t in evs:
                if t == "conv":
                    continue
                nxt = next(
                    (c for c in convs if (ms, eid) < (c[1], c[2])), None
                )
                if nxt and nxt[0] == conv_idx and cms - ms <= window_s * 1000:
                    touches.append((ms, eid, t))
            if not touches:
                continue
            n_tot = len(touches)
            first = min(touches)[:2]
            last = max(touches)[:2]
            by_type: dict[str, list] = {}
            for ms, eid, t in touches:
                by_type.setdefault(t, []).append((ms, eid))
            for t, ks in by_type.items():
                want.add(
                    (
                        u,
                        conv_idx,
                        cid,
                        t,
                        len(ks),
                        n_tot,
                        round(len(ks) / n_tot, 12),
                        first in ks,
                        last in ks,
                    )
                )
    assert got == want, (sorted(got), sorted(want))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(10**30), max_value=10**30),
            st.integers(min_value=-(2**64), max_value=2**64),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=24,
    ),
)
def test_fp_from_decimal_matches_duckdb_twin_bitwise(spark, vals):
    """functions.fp_from_decimal is the portable exact->double build
    (int128->double mis-rounds exact ties above 2^53 in some engines).
    Property: for ANY decimal magnitude up to ~1e30, the Spark column
    expression and the DuckDB _fp62_sql twin produce BIT-IDENTICAL
    doubles, and the value is within 1 ulp of Python's correctly
    rounded float()."""
    import math

    import duckdb

    from buskafkasparkstreaming_spark.functions import fp_from_decimal
    from pyspark.sql import functions as F
    from __spark_entry__ import _fp62_sql

    df = spark.createDataFrame([(i, str(v)) for i, v in enumerate(vals)], "i long, v string")
    got = {
        r["i"]: r["fp"]
        for r in df.select(
            "i", fp_from_decimal(F.col("v").cast("decimal(38,0)")).alias("fp")
        ).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(vals):
        twin = con.sql(
            f"SELECT {_fp62_sql(f'CAST({v!r} AS HUGEINT)')}"
        ).fetchone()[0]
        assert got[i].hex() == twin.hex(), (v, got[i].hex(), twin.hex())
        exact = float(v)
        if exact != 0.0:
            assert abs(got[i] - exact) <= math.ulp(exact), (v, got[i], exact)
        else:
            assert got[i] == 0.0, (v, got[i])
    con.close()


_intervals = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=_intervals,
    right=_intervals,
    bucket_ms=st.sampled_from([3, 7, 10]),
)
def test_allen_bucketed_matches_brute_force(spark, left, right, bucket_ms):
    """allen_join_bucketed == the brute-force intersect-or-touch join
    classified by the shared cascade, for ANY interval sets and bucket
    size — including NEGATIVE start times (the pmod floor-division
    bucketing) and degenerate point intervals. Pins the covering lemma
    (every intersecting-or-touching pair shares >= 1 bucket, so the
    bucket equi-join misses nothing) and the dedup of multi-bucket
    matches."""
    from buskafkasparkstreaming_spark.operators.joins import (
        ALLEN_RELATIONS,
        allen_join_bucketed,
    )

    lrows = [(i, s, s + ln) for i, (s, ln) in enumerate(left)]
    rrows = [(j, s, s + ln) for j, (s, ln) in enumerate(right)]
    lf = spark.createDataFrame(lrows, "id_a long, s_a long, e_a long")
    rf = spark.createDataFrame(rrows, "id_b long, s_b long, e_b long")
    got = {
        (r["id_a"], r["id_b"]): r["relation"]
        for r in allen_join_bucketed(lf, rf, bucket_ms).collect()
    }

    def classify(sa, ea, sb, eb):
        env = {"sa": sa, "ea": ea, "sb": sb, "eb": eb}
        for name, expr in ALLEN_RELATIONS:
            ok = True
            for clause in expr.split(" AND "):
                a, op, b = clause.split(" ")
                x, y = env[a], env[b]
                ok = ok and {"=": x == y, "<": x < y, ">": x > y}[op]
            if ok:
                return name
        raise AssertionError((sa, ea, sb, eb))

    want = {}
    for i, sa, ea in lrows:
        for j, sb, eb in rrows:
            if sa <= eb and sb <= ea:  # intersect-or-touch
                want[(i, j)] = classify(sa, ea, sb, eb)
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=30,
    ),
    split=st.integers(min_value=0, max_value=29),
)
def test_streaming_skyline_matches_brute_force(spark, tmp_path, pts, split):
    """The drained streaming frontier == the brute-force dominance
    skyline of ALL points, for ANY point multiset and ANY 2-file batch
    split (duplicates, all-dominated batches, negative coords). The
    max-n_seen selection must recover the final state regardless of
    where the split lands."""
    import os
    import tempfile
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buskafkasparkstreaming_spark.streaming.state import skyline_per_key
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    split = min(split, len(pts))
    batches = [b for b in (pts[:split], pts[split:]) if b]
    # tmp_path is shared across hypothesis examples — fresh dir each
    d = Path(tempfile.mkdtemp(dir=tmp_path))
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_type": pa.array([k for (k, _, _) in rows]),
                "x": pa.array([x for (_, x, _) in rows], pa.int64()),
                "y": pa.array([y for (_, _, y) in rows], pa.int64()),
            }
        )
        path = str(d / f"b{i}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(d))
    )
    res = run_to_memory(
        skyline_per_key(stream, key_col="event_type"), spark,
        output_mode="update",
    ).collect()
    best = {}
    for r in res:
        best[r["event_type"]] = max(best.get(r["event_type"], 0), r["n_seen"])
    got = {
        k: {
            (r["x"], r["y"])
            for r in res
            if r["event_type"] == k and r["n_seen"] == best[k]
        }
        for k in best
    }

    want = {}
    for k in {p[0] for p in pts}:
        kp = {(x, y) for (kk, x, y) in pts if kk == k}
        want[k] = {
            p
            for p in kp
            if not any(
                q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
                for q in kp
            )
        }
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C", None]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=80,
    ),
    k=st.integers(min_value=1, max_value=7),
)
def test_grouped_ntile_matches_sql_ntile(spark, rows, k):
    """grouped_ntile is bit-identical to `ntile(k) OVER (PARTITION BY g
    ORDER BY v DESC, id ASC)` — Spark's own single-task-per-group window
    is the ground truth; the distributed range-partitioned formulation
    must agree on EVERY row for any group-size mix (including groups
    smaller than k, absent groups, ties on v broken by id, and the
    NULL group — SQL gives NULL its own window partition, so the
    null-safe stats join must keep those rows)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.windows_fn import (
        grouped_ntile,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, v long, id long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = grouped_ntile(df, ["g"], order, k, "q", num_partitions=8)
    w = Window.partitionBy("g").orderBy(*order)
    want = df.withColumn("q_ref", F.ntile(k).over(w))
    j = got.join(
        want,
        [
            got["g"].eqNullSafe(want["g"]),
            got["v"] == want["v"],
            got["id"] == want["id"],
        ],
    )
    assert j.filter(F.col("q") != F.col("q_ref")).count() == 0
    assert got.count() == len(data)  # NULL-group rows must not drop


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C", None]),
            st.integers(min_value=-1000, max_value=1000),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=80,
    ),
)
def test_grouped_running_sum_matches_sql_window(spark, rows):
    """grouped_running_sum is bit-identical to `sum(x) OVER (PARTITION BY
    g ORDER BY v, id)` — Spark's own single-task-per-group window is the
    ground truth; the distributed composite-range formulation must agree
    on EVERY row for any group-size mix (including the NULL group, which
    SQL gives its own window partition, NULL x contributing 0, and
    sum columns whose per-group prefix crosses zero)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.windows_fn import (
        grouped_running_sum,
    )

    data = [(g, v, i, x) for i, (g, v, x) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, v long, id long, x long")
    order = [F.col("v").asc(), F.col("id").asc()]
    got = grouped_running_sum(df, ["g"], order, ["x"], num_partitions=8)
    w = Window.partitionBy("g").orderBy(*order)
    want = df.select(
        "g",
        "v",
        "id",
        F.sum(F.coalesce(F.col("x"), F.lit(0))).over(w).alias("x_ref"),
    )
    j = got.join(
        want,
        [
            got["g"].eqNullSafe(want["g"]),
            got["v"] == want["v"],
            got["id"] == want["id"],
        ],
    )
    assert j.filter(F.col("x") != F.col("x_ref")).count() == 0
    assert got.count() == len(data)  # NULL-group rows must not drop


def test_grouped_running_sum_guards_driver_collect(spark):
    """Round-15 hygiene (VERDICT r14 item 3): the bounded-by-contract
    driver collect is now ENFORCED — a high-cardinality group column
    raises instead of silently materializing an unbounded offset frame,
    and non-atomic group types fail fast at entry (their values become
    driver-side dict keys / createDataFrame literals)."""
    import pytest
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.windows_fn import (
        grouped_running_sum,
    )

    df = spark.range(200).select(
        F.col("id").alias("g"), F.col("id").alias("v"), F.lit(1).alias("x")
    )
    with pytest.raises(ValueError, match="max_offset_rows"):
        grouped_running_sum(
            df,
            ["g"],
            [F.col("v").asc()],
            ["x"],
            num_partitions=4,
            max_offset_rows=50,
        )
    arr = df.withColumn("ga", F.array("g"))
    with pytest.raises(TypeError, match="non-atomic"):
        grouped_running_sum(arr, ["ga"], [F.col("v").asc()], ["x"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=120,
    ),
    parts=st.integers(min_value=1, max_value=9),
)
def test_skyline_nd_matches_brute_force(spark, pts, parts):
    """skyline_nd's two-phase (local frontier → coalesce(1) merge)
    equals the O(n²) dominance brute force for ANY partitioning —
    including duplicate points (must collapse to one output row),
    all-duplicates inputs, and single-point frontiers. Dims: minimize
    a, minimize b, maximize c."""
    from pyspark.sql import functions as F  # noqa: F401

    from buskafkasparkstreaming_spark.operators.windows_fn import skyline_nd

    df = spark.createDataFrame(
        pts + pts[: len(pts) // 3], "a long, b long, c long"
    ).repartition(parts)
    got = {tuple(r) for r in skyline_nd(df, ["a", "b"], ["c"]).collect()}
    S = set(pts)
    want = {
        p
        for p in S
        if not any(
            q[0] <= p[0]
            and q[1] <= p[1]
            and q[2] >= p[2]
            and (q[0] < p[0] or q[1] < p[1] or q[2] > p[2])
            for q in S
        )
    }
    assert got == want, (sorted(got ^ want))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=40),   # x score
            st.integers(min_value=0, max_value=3),    # y (small ints)
        ),
        min_size=1,
        max_size=60,
    ),
)
def test_isotonic_blocks_match_reference(spark, rows):
    """isotonic_fit_blocks equals a quadratic pool-until-monotone PAV
    reference in exact Fractions for any data and partitioning, and the
    two closed-form facts the SQL oracle relies on hold: the FIRST
    block is the longest prefix attaining the minimal prefix mean and
    the LAST block the longest suffix attaining the maximal suffix
    mean (weak pooling merges equal-mean neighbors)."""
    from fractions import Fraction

    from buskafkasparkstreaming_spark.operators.stats import (
        isotonic_fit_blocks,
    )

    data = [(g, x, y, i) for i, (g, x, y) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "g string, x long, y long, tb long"
    ).repartition(5)
    got = {
        (r["g"], r["block_id"]): (r["n"], r["sum_y"], r["x_lo"], r["x_hi"])
        for r in isotonic_fit_blocks(df, "g", "x", "y", "tb").collect()
    }

    for key in {g for (g, _, _) in rows}:
        pts = sorted(
            ((x, i, y) for (g, x, y), i in zip(rows, range(len(rows))) if g == key),
        )
        blocks = [[1, y, x, x] for (x, _i, y) in pts]
        changed = True
        while changed:  # quadratic pool-until-monotone reference
            changed = False
            i = 0
            while i + 1 < len(blocks):
                n1, s1, lo1, _ = blocks[i]
                n2, s2, _, hi2 = blocks[i + 1]
                if Fraction(s1, n1) >= Fraction(s2, n2):
                    blocks[i] = [n1 + n2, s1 + s2, lo1, hi2]
                    del blocks[i + 1]
                    changed = True
                else:
                    i += 1
        want = {
            (key, i + 1): (n, s, lo, hi)
            for i, (n, s, lo, hi) in enumerate(blocks)
        }
        assert {k: v for k, v in got.items() if k[0] == key} == want

        # closed-form facts used by the SQL oracle
        ys = [y for (_x, _i, y) in pts]
        N = len(ys)
        pref = [
            (Fraction(sum(ys[:k]), k), k) for k in range(1, N + 1)
        ]
        best = min(f for f, _ in pref)
        first_den = max(k for f, k in pref if f == best)
        assert (blocks[0][0], blocks[0][1]) == (
            first_den, sum(ys[:first_den])
        )
        suf = [
            (Fraction(sum(ys[j:]), N - j), N - j) for j in range(N)
        ]
        best_s = max(f for f, _ in suf)
        last_len = max(m for f, m in suf if f == best_s)
        assert (blocks[-1][0], blocks[-1][1]) == (
            last_len, sum(ys[N - last_len:])
        )


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-2, max_value=12),
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_weighted_reservoir_tiers_property(spark, rows, k):
    """weighted_reservoir_tiers == the sequential A-ES reference for
    ANY stratum/id/weight multiset (hypothesis drives duplicates and
    out-of-range weights naturally): same clamp, same max-of-w-md5
    priority, same (prio DESC, id, w) top-k, set semantics."""
    import hashlib

    from buskafkasparkstreaming_spark.operators.sampling import (
        weighted_reservoir_tiers,
    )

    df = spark.createDataFrame(rows, "s string, id long, w long")
    out = weighted_reservoir_tiers(
        df, id_col="id", weight_col="w", stratum_col="s", k=k,
        salt="hp", max_weight=8, prune_buckets=3,
    )
    got = {(r.s, r.id, r.w, r.prio) for r in out.collect()}

    pool: dict[tuple, str] = {}
    for s, i, w in rows:
        w2 = min(max(w, 1), 8)
        pool[(s, i, w2)] = max(
            hashlib.md5(f"{i}:{j}:hp".encode()).hexdigest()
            for j in range(1, w2 + 1)
        )
    want = set()
    for s in {s for s, _, _ in rows}:
        items = sorted(
            ((p, i, w) for (ss, i, w), p in pool.items() if ss == s),
            key=lambda t: (t[1], t[2]),
        )
        items.sort(key=lambda t: t[0], reverse=True)
        want |= {(s, i, w, p) for p, i, w in items[:k]}
    assert got == want
