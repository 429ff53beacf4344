"""Property-based tests (hypothesis) for the round-3 integer algebra:
Morton interleave masks and the pack-span arithmetic. The Morton mirror
imports the actual _SPREAD constants from tile.py; the pack mirror is a
hand-transcribed copy of packing.py's span formulas (keep the two in
sync — the example-based Spark tests in test_packing_mix are the ones
that exercise the real operator). A property violation here means the
algebra itself is wrong."""

from hypothesis import given, settings
from hypothesis import strategies as st

from rio_cogeo_spark.functions.tile import _SPREAD

coords = st.integers(min_value=0, max_value=(1 << 32) - 1)
tokcounts = st.lists(
    st.integers(min_value=1, max_value=5000), min_size=1, max_size=200
)
ctx = st.integers(min_value=1, max_value=4096)


def _spread_py(v: int) -> int:
    """The exact mask/shift pipeline from tile.py, on Python ints."""
    v &= 0xFFFFFFFF
    for shift, mask in _SPREAD:
        v = (v | (v << shift)) & mask
    return v


def _morton_py(x: int, y: int) -> int:
    return _spread_py(x) | (_spread_py(y) << 1)


def _morton_ref(x: int, y: int) -> int:
    out = 0
    for i in range(32):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


@given(coords, coords)
@settings(max_examples=300, deadline=None)
def test_morton_masks_equal_bit_interleave(x, y):
    assert _morton_py(x, y) == _morton_ref(x, y)


@given(coords, coords, coords, coords)
@settings(max_examples=300, deadline=None)
def test_morton_injective(x1, y1, x2, y2):
    if (x1, y1) != (x2, y2):
        assert _morton_py(x1, y1) != _morton_py(x2, y2)


@given(coords, st.integers(min_value=0, max_value=(1 << 31) - 1))
@settings(max_examples=300, deadline=None)
def test_morton_fits_in_signed_64_on_documented_domain(x, y):
    """x < 2^32, y < 2^31 (any zoom <= 31) stays nonnegative in a
    signed BIGINT — the documented ordering-safe domain."""
    assert 0 <= _morton_py(x, y) < (1 << 63)


def test_morton_sign_flips_just_past_domain():
    """y = 2^31 is exactly the first coordinate whose key would read
    negative as a signed BIGINT — why the domain stops at zoom 31."""
    assert _morton_py(0, 1 << 31) >= (1 << 63)


def _pack_py(ntokens, C):
    """The exact pack_chunks span arithmetic (prev div C .. (cum-1) div
    C) over one shard stream, on Python ints."""
    rows = []
    cum = 0
    for i, nt in enumerate(ntokens):
        prev, cum = cum, cum + nt
        for p in range(prev // C, (cum - 1) // C + 1):
            start = max(prev, p * C)
            rows.append(
                {"doc": i, "pack": p, "off": start - p * C,
                 "tok": min(cum, (p + 1) * C) - start}
            )
    return rows


@given(tokcounts, ctx)
@settings(max_examples=200, deadline=None)
def test_pack_conserves_tokens(ntokens, C):
    rows = _pack_py(ntokens, C)
    per_doc = {}
    for r in rows:
        per_doc[r["doc"]] = per_doc.get(r["doc"], 0) + r["tok"]
    assert per_doc == {i: nt for i, nt in enumerate(ntokens)}


@given(tokcounts, ctx)
@settings(max_examples=200, deadline=None)
def test_pack_nonfinal_packs_exactly_full_and_tiled(ntokens, C):
    rows = _pack_py(ntokens, C)
    packs = {}
    for r in rows:
        packs.setdefault(r["pack"], []).append(r)
    last = max(packs)
    for p, rs in packs.items():
        total = sum(r["tok"] for r in rs)
        assert total <= C
        if p < last:
            assert total == C
        # segments tile [0, total) exactly
        rs.sort(key=lambda r: r["off"])
        pos = 0
        for r in rs:
            assert r["off"] == pos and r["tok"] >= 1
            pos += r["tok"]
        assert pos == total


@given(tokcounts, ctx)
@settings(max_examples=200, deadline=None)
def test_pack_ids_contiguous_from_zero(ntokens, C):
    rows = _pack_py(ntokens, C)
    ids = {r["pack"] for r in rows}
    assert ids == set(range(len(ids)))


# ---------------------------------------------------------------------------
# round-5 algebra: phrase anchor decomposition + vocab-weighted BPE counts
# ---------------------------------------------------------------------------

words = st.sampled_from(["a", "b", "ab", "the", "zz"])
docs_strat = st.lists(words, min_size=0, max_size=40)
phrase_strat = st.lists(words, min_size=1, max_size=4)


def _phrase_count_anchors(tokens, phrase):
    """The anchor-decomposition count from search.phrase_topk, on
    Python ints: occurrence of phrase[i] at p votes for start p - i;
    a start is real iff all m slots voted."""
    m = len(phrase)
    slots = {}
    for i, t in enumerate(phrase):
        slots.setdefault(t, []).append(i)
    votes = {}
    for p, tok in enumerate(tokens):
        for i in slots.get(tok, ()):
            a = p - i
            if a >= 0:
                votes[a] = votes.get(a, 0) + 1
    return sum(1 for a, n in votes.items() if n == m)


def _phrase_count_naive(tokens, phrase):
    m = len(phrase)
    return sum(
        1
        for s in range(len(tokens) - m + 1)
        if tokens[s:s + m] == phrase
    )


@given(docs_strat, phrase_strat)
@settings(max_examples=400, deadline=None)
def test_phrase_anchor_decomposition_equals_naive_scan(tokens, phrase):
    assert _phrase_count_anchors(tokens, phrase) == _phrase_count_naive(
        tokens, phrase
    )


@given(st.lists(st.sampled_from(["ab", "aba", "zz", "q", "hello"]),
                min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_bpe_vocab_weighted_counts_equal_per_occurrence_counts(stream):
    """bpe.py counts char pairs over the word-FREQUENCY table weighted
    by n_w; that must equal counting over every word occurrence."""
    from collections import Counter

    freq = Counter(w for w in stream if len(w) >= 2)
    weighted = Counter()
    for w, n in freq.items():
        for i in range(len(w) - 1):
            weighted[w[i:i + 2]] += n
    direct = Counter()
    for w in stream:
        if len(w) >= 2:
            for i in range(len(w) - 1):
                direct[w[i:i + 2]] += 1
    assert weighted == direct


# ---------------------------------------------------------------------------
# round-5 exact-int invariants (pure-Python mirrors of the SQL algebra;
# the Spark/DuckDB cross-engine equality is covered by the oracle suite,
# these pin the ALGEBRA: bounds, monotonicity, and probe equivalence)
# ---------------------------------------------------------------------------

values = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=1, max_size=300
)


def _quantile_py(vals, num, den):
    """group_quantiles' probe: smallest v whose cum*den >= n*num."""
    n = len(vals)
    cum = 0
    for v, cnt in sorted(
        {x: vals.count(x) for x in vals}.items()
    ):
        cum += cnt
        if cum * den >= n * num:
            return v
    raise AssertionError("probe never fired")


@given(values)
@settings(max_examples=200, deadline=None)
def test_quantile_probe_equals_ceil_position(vals):
    # cum*den >= n*num  ⟺  cum >= ceil(n*num/den): the quantile equals
    # the ceil(n*q)-th smallest element (1-based), for all three quarts
    s = sorted(vals)
    n = len(s)
    for num, den in ((1, 4), (1, 2), (3, 4)):
        pos = -(-n * num // den)  # ceil
        assert _quantile_py(vals, num, den) == s[max(pos, 1) - 1]


@given(values)
@settings(max_examples=200, deadline=None)
def test_quantiles_monotone(vals):
    p25 = _quantile_py(vals, 1, 4)
    p50 = _quantile_py(vals, 1, 2)
    p75 = _quantile_py(vals, 3, 4)
    assert p25 <= p50 <= p75


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                max_size=60))
@settings(max_examples=200, deadline=None)
def test_bigram_pred_ppm_bounds(counts):
    # pred_ppm = cnt2*1e6 div cnt1 with cnt1 = sum over the prefix group:
    # always in (0, 1e6], and the occurrence-weighted mean stays in range
    cnt1 = sum(counts)
    preds = [(c * 1_000_000) // cnt1 for c in counts]
    assert all(0 <= p <= 1_000_000 for p in preds)
    mean = sum(c * p for c, p in zip(counts, preds)) // cnt1
    assert 0 <= mean <= 1_000_000


@given(st.integers(min_value=0, max_value=(1 << 40)),
       st.integers(min_value=0, max_value=(1 << 20)),
       st.integers(min_value=0, max_value=4))
@settings(max_examples=200, deadline=None)
def test_frontier_priority_monotone_in_rank_and_depth(rank, recip_raw, hops):
    # priority is non-decreasing in rank, non-increasing in hops and in
    # the reciprocity discount — for ALL exact-int inputs
    recip = min(recip_raw, 1_000_000)

    def prio(r, rc, h):
        return ((r * (1_000_000 - rc // 2)) // 1_000_000) // (h + 1)

    assert prio(rank + 1, recip, hops) >= prio(rank, recip, hops)
    assert prio(rank, recip, hops) >= prio(rank, recip, hops + 1)
    if recip < 1_000_000:
        assert prio(rank, recip, hops) >= prio(rank, recip + 2, hops)
