"""Edit-distance self-join (raykg/ops/editjoin.py): exact vs a
brute-force all-pairs Levenshtein, d=1 and d=2, partition invariance,
unicode, equal-string pairs."""

import itertools

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.editjoin import _lev_leq, edit_distance_pairs


def _ed(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        nd = [i] + [0] * lb
        for j in range(1, lb + 1):
            nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                        d[j - 1] + (a[i - 1] != b[j - 1]))
        d = nd
    return d[lb]


def _brute(strs, d):
    out = []
    for (i, a), (j, b) in itertools.combinations(enumerate(strs), 2):
        if _ed(a, b) <= d:
            out.append((i, j))
    return sorted(out)


def _got(df, d, blocks=5):
    res = edit_distance_pairs(
        rd.from_pandas(df, override_num_blocks=blocks), "s", "id",
        max_dist=d).to_pandas()
    return sorted(map(tuple, res[["id_a", "id_b"]].to_numpy()))


def test_lev_leq_exact():
    rng = np.random.default_rng(0)
    for _ in range(300):
        a = "".join(rng.choice(list("abc"), size=rng.integers(0, 8)))
        b = "".join(rng.choice(list("abc"), size=rng.integers(0, 8)))
        for d in (1, 2):
            assert _lev_leq(a, b, d) == (_ed(a, b) <= d), (a, b, d)


def test_pairs_match_bruteforce_d1_d2():
    rng = np.random.default_rng(4)
    base = ["widget-%03d" % i for i in range(40)]
    noisy = []
    for s in base:
        t = list(s)
        if rng.random() < 0.6:
            t[rng.integers(len(t))] = "x"       # substitution
        if rng.random() < 0.3:
            del t[rng.integers(len(t))]          # deletion
        noisy.append("".join(t))
    strs = base + noisy
    df = pd.DataFrame({"id": range(len(strs)), "s": strs})
    for d in (1, 2):
        assert _got(df, d) == _brute(strs, d), f"d={d}"


def test_partition_invariance_and_duplicates():
    strs = ["alpha", "alpha", "alphb", "beta", "betaa", "gamma"]
    df = pd.DataFrame({"id": range(len(strs)), "s": strs})
    want = _brute(strs, 1)
    assert _got(df, 1, blocks=1) == want
    assert _got(df, 1, blocks=6) == want
    assert (0, 1) in want            # equal strings are a pair


def test_unicode():
    strs = ["café", "cafe", "caffé", "日本語", "日本誤"]
    df = pd.DataFrame({"id": range(len(strs)), "s": strs})
    assert _got(df, 1) == _brute(strs, 1)


def test_verify_pairs_randomized_direct():
    from raykg.ops.editjoin import _verify_pairs

    rng = np.random.default_rng(8)
    sa, sb = [], []
    for _ in range(500):
        sa.append("".join(rng.choice(list("abcd"), size=rng.integers(0, 10))))
        sb.append("".join(rng.choice(list("abcd"), size=rng.integers(0, 10))))
    got = _verify_pairs(np.array(sa, object), np.array(sb, object), 1)
    want = np.array([_ed(a, b) <= 1 for a, b in zip(sa, sb)])
    assert (got == want).all()
