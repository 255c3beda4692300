"""PMI collocations (raykg/ops/vocab.py pmi_bigrams): pinned vs an
in-memory reference, partition invariance, min_count floor."""

import numpy as np
import pandas as pd
import ray.data as rd

from raykg.ops.vocab import pmi_bigrams


def _ref(texts, k=50, min_count=5):
    toks = [t.split(" ") for t in texts]
    uni, big = {}, {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(big.values())
    rows = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        ratio = ((c * float(nu)) * float(nu)) / (
            (float(nb) * uni[a]) * uni[b])
        rows.append((a, b, c,
                     np.floor(np.log(ratio) * 1e6 + 0.5) / 1e6))
    df = pd.DataFrame(rows, columns=["w1", "w2", "cxy", "pmi"])
    return (df.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True],
                           kind="mergesort")
            .head(k).reset_index(drop=True))


def _corpus(seed=5, n=300):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(n):
        words = list(rng.choice(vocab, size=rng.integers(5, 30)))
        # plant a strong collocation pair
        if rng.random() < 0.5:
            words[2:2] = ["strong", "pair"]
        texts.append(" ".join(words))
    return texts


def test_pmi_matches_reference_and_partitions():
    texts = _corpus()
    df = pd.DataFrame({"text": texts})
    want = _ref(texts, k=20, min_count=3)
    for blocks in (1, 7):
        got = pmi_bigrams(rd.from_pandas(df, override_num_blocks=blocks),
                          k=20, min_count=3)
        got = got.astype({"cxy": "int64"})
        want2 = want.astype({"cxy": "int64"})
        pd.testing.assert_frame_equal(got, want2)
    # the planted collocation must rank first
    assert (want.iloc[0]["w1"], want.iloc[0]["w2"]) == ("strong", "pair")


def test_min_count_floor():
    texts = ["a b", "a b", "c d"]
    got = pmi_bigrams(rd.from_pandas(pd.DataFrame({"text": texts})),
                      min_count=2)
    assert got[["w1", "w2"]].to_records(index=False).tolist() == [
        ("a", "b")]
