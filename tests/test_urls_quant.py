"""URL parsing/host stats (raykg/ops/urls.py), winsorization
(raykg/ops/quantile.py), and grouped OLS (raykg/ops/profile.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raykg.ops.profile import grouped_ols
from raykg.ops.quantile import winsorize
from raykg.ops.urls import cap_per_domain, host_stats, parse_urls

URLS = [
    "https://news.example.com/world/2026/08/a?id=1",
    "https://news.example.com/world/2026/08/a?id=2",   # same path, 2 docs
    "http://blog.example.com:8080/post",
    "ftp://files.archive.org/pub/data.bin",
    "https://localhost/x?y=z#frag",
    "not a url at all",
    "https://sub.deep.news.example.com/p",
]


def test_parse_urls_fields():
    ds = rd.from_pandas(pd.DataFrame({"url": URLS,
                                      "doc_id": range(len(URLS))}))
    out = parse_urls(ds).to_pandas().sort_values("doc_id")
    assert list(out["url_scheme"]) == [
        "https", "https", "http", "ftp", "https", "", "https"]
    assert list(out["url_host"]) == [
        "news.example.com", "news.example.com", "blog.example.com:8080",
        "files.archive.org", "localhost", "", "sub.deep.news.example.com"]
    # registrable domain: port-stripped, last two labels; single-label
    # hosts are their own domain
    assert list(out["url_domain"]) == [
        "example.com", "example.com", "example.com", "archive.org",
        "localhost", "", "example.com"]
    assert out["url_path"].iloc[0] == "/world/2026/08/a"
    assert out["url_query"].iloc[0] == "id=1"
    assert out["url_query"].iloc[2] == ""      # no ?query present
    # fragment excluded from query
    assert out["url_query"].iloc[4] == "y=z"


def test_host_stats_counts():
    ds = rd.from_pandas(pd.DataFrame({"url": URLS})).repartition(3)
    out = host_stats(ds)
    row = out[out["host"] == "news.example.com"].iloc[0]
    assert row["n_docs"] == 2 and row["n_paths"] == 1
    assert out[out["host"] == "localhost"].iloc[0]["n_docs"] == 1
    # unparseable row aggregates under host ''
    assert out[out["host"] == ""].iloc[0]["n_docs"] == 1


def test_cap_per_domain():
    urls = [f"https://d{i % 3}.test/p{j}" for i in range(3)
            for j in range(10) for _ in [0]]
    df = pd.DataFrame({"url": urls, "doc_id": range(len(urls)),
                       "q": np.arange(len(urls)) % 7})
    ds = rd.from_pandas(df).repartition(4)
    capped = cap_per_domain(ds, "url", "doc_id", k=4).to_pandas()
    assert len(capped) == 12
    # deterministic: smallest doc_id per domain
    by_dom = capped.groupby("url_domain")["doc_id"].apply(
        lambda s: sorted(s))
    for dom, ids in by_dom.items():
        want = sorted(df[df["url"].str.contains(dom.split(".")[0] + ".")]
                      ["doc_id"])[:4]
        assert ids == want
    # quality-ordered variant keeps the best-q rows
    best = cap_per_domain(ds, "url", "doc_id", k=2,
                          quality_col="q").to_pandas()
    assert len(best) == 6
    assert set(best.groupby("url_domain")["q"].max()) == {6}


def test_winsorize_exact_bounds():
    rng = np.random.default_rng(0)
    x = np.concatenate([np.arange(1, 1001, dtype=np.float64),
                        [10_000.0, -5_000.0]])
    rng.shuffle(x)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(5)
    out, (lo, hi) = winsorize(ds, "v", 0.25, 0.75)
    df = out.to_pandas()
    assert lo == np.quantile(x, 0.25) and hi == np.quantile(x, 0.75)
    assert df["v_w"].min() == lo and df["v_w"].max() == hi
    assert (df["clipped"] == -1).sum() == (x < lo).sum()
    assert (df["clipped"] == 1).sum() == (x > hi).sum()
    kept = df[df["clipped"] == 0]
    assert np.array_equal(np.sort(kept["v_w"]), np.sort(x[(x >= lo) & (x <= hi)]))


def test_grouped_ols_matches_numpy():
    rng = np.random.default_rng(2)
    n = 3000
    key = rng.integers(0, 4, n)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = (2 * key + 1) * x + 10 * key + rng.integers(-3, 4, n)
    df = pd.DataFrame({"k": key, "x": x, "y": y})
    out = grouped_ols(rd.from_pandas(df).repartition(6), "k", "x", "y")
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]]
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        assert abs(row["slope"] - slope) < 1e-8
        assert abs(row["intercept"] - intercept) < 1e-6
        assert row["n"] == len(g)


# ------------------------------------------------------------ inverted index

def test_inverted_index_matches_bruteforce():
    import ray.data as rd

    from raykg.ops.invindex import build_inverted_index, lookup_postings

    texts = ["a b a c", "b b d", "a d d e", "c", ""]
    ids = [10, 20, 30, 40, 50]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    want = {}
    for i, t in zip(ids, texts):
        for w in t.split():
            want.setdefault(w, {}).setdefault(i, 0)
            want[w][i] += 1
    for parts in (1, 3):
        ds = rd.from_pandas(df).repartition(parts)
        idx = build_inverted_index(ds).to_pandas()
        assert set(idx["term"]) == set(want)
        for _, row in idx.iterrows():
            postings = want[row["term"]]
            assert row["df"] == len(postings)
            assert row["seg"] == 0 and row["n_seg"] == 1
            assert list(row["doc_ids"]) == sorted(postings)
            assert list(row["tfs"]) == [postings[d] for d in
                                        sorted(postings)]
    got = lookup_postings(build_inverted_index(ds), ["a", "zz"])
    assert list(got["term"]) == ["a"]
    assert list(got["doc_ids"].iloc[0]) == [10, 30]


def test_inverted_index_segments_hot_terms():
    import ray.data as rd

    from raykg.ops.invindex import build_inverted_index, lookup_postings

    # 'hot' appears in 25 docs; segment=8 -> 4 segments of <= 8
    df = pd.DataFrame({
        "doc_id": range(25),
        "text": ["hot cold" if i % 2 == 0 else "hot" for i in range(25)],
    })
    idx = build_inverted_index(rd.from_pandas(df).repartition(5),
                               segment=8)
    got = idx.to_pandas()
    hot = got[got["term"] == "hot"].sort_values("seg")
    assert len(hot) == 4
    assert list(hot["n_seg"]) == [4] * 4
    assert all(len(s) <= 8 for s in hot["doc_ids"])
    assert [i for seg in hot["doc_ids"] for i in seg] == list(range(25))
    # reassembly helper glues segments back in order
    full = lookup_postings(idx, ["hot"])
    assert list(full["doc_ids"].iloc[0]) == list(range(25))
    assert full["df"].iloc[0] == 25
