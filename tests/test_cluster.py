import numpy as np

from raykg.cluster import (
    Cluster,
    cosine_distance_matrix,
    feature_clusters,
    feature_scores,
    greedy_clusters,
    greedy_labels,
    medoid,
    run_clusterer,
    single_linkage_components,
    threestep_clusters,
)
from raykg.encode import HashEncoder


def test_greedy_labels_reference_semantics():
    # hand-computed propagation on a 3x3 score matrix, threshold 0.5
    s = np.array([[1.0, 0.9, 0.0], [0.9, 1.0, 0.0], [0.0, 0.0, 1.0]])
    labels = greedy_labels(s, 0.5)
    assert labels.tolist() == [0, 0, 2]
    # order dependence: the loop is sequential by construction
    s2 = np.array(
        [[1.0, 0.9, 0.0, 0.0],
         [0.9, 1.0, 0.9, 0.0],
         [0.0, 0.9, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]]
    )
    assert greedy_labels(s2, 0.5).tolist() == [0, 0, 0, 3]


def test_medoid_exact():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0]], dtype=np.float32)
    # sums of distances: p0: 1+10=11, p1: 1+9=10, p2: 10+9=19 -> medoid p1
    np.testing.assert_array_equal(medoid(pts), pts[1])
    one = np.array([[3.0, 4.0]], dtype=np.float32)
    np.testing.assert_array_equal(medoid(one), one[0])


def test_greedy_clusters_on_encoder_vectors():
    enc = HashEncoder()
    mentions = ["Zorblax Dynamics", "Zorblax Dynamics", "Falu Nedo", "Falu Nedo"]
    E = enc.encode_mentions(mentions, ["a", "b", "c", "d"], ["w", "x", "y", "z"])
    clusters = greedy_clusters([1, 2, 3, 4], mentions, E)
    got = sorted(tuple(sorted(c.mention_ids)) for c in clusters)
    assert got == [(1, 2), (3, 4)]
    for c in clusters:
        assert c.title() in mentions
        assert any((c.center() == e).all() for e in E)  # medoid is a member


def test_modal_title_value_counts_semantics():
    c = Cluster(
        mention_ids=[1, 2, 3],
        mentions=["Foo", "Bar", "Foo"],
        encodings=[np.zeros(4, dtype=np.float32)] * 3,
    )
    assert c.title() == "Foo"


def test_single_linkage_threshold_is_connected_components():
    d = np.array(
        [[0.0, 0.1, 0.9], [0.1, 0.0, 0.9], [0.9, 0.9, 0.0]]
    )
    labels = single_linkage_components(d, 0.2)
    assert labels[0] == labels[1] != labels[2]
    labels = single_linkage_components(d, 0.95)
    assert len(set(labels.tolist())) == 1


def test_feature_scores_identical_mentions():
    s = feature_scores(["alpha", "alpha", "beta"], ["same ctx words"] * 3)
    assert s[0, 1] > 0.99  # identical mention + identical context
    assert s[0, 2] < 0.9


def test_feature_clusters_groups_same_surface():
    enc = HashEncoder()
    mentions = ["Zorblax", "Zorblax", "Nedo"]
    E = enc.encode_mentions(mentions, ["l"] * 3, ["r"] * 3)
    clusters = feature_clusters(
        [1, 2, 3], mentions, E, ["same left"] * 3, ["same right"] * 3
    )
    got = sorted(tuple(sorted(c.mention_ids)) for c in clusters)
    assert got == [(1, 2), (3,)]


def test_threestep_same_surface_merges():
    enc = HashEncoder()
    mentions = ["Zorblax Dynamics", "Zorblax Dynamics", "Falu Nedo"]
    E = enc.encode_mentions(mentions, ["a", "b", "c"], ["x", "y", "z"])
    clusters = threestep_clusters([1, 2, 3], mentions, E)
    got = sorted(tuple(sorted(c.mention_ids)) for c in clusters)
    assert got == [(1, 2), (3,)]


def test_threestep_breakup_path():
    # >25 distinct surfaces far apart in both string and vector space
    enc = HashEncoder()
    mentions = [f"Xx{chr(65 + i)}qzt{i}" for i in range(30)]
    E = enc.encode_mentions(mentions, ["c"] * 30, ["c"] * 30)
    clusters = threestep_clusters(list(range(30)), mentions, E)
    total = sum(c.nelements for c in clusters)
    assert total == 30


def test_run_clusterer_dispatch():
    enc = HashEncoder()
    m = ["Aa Bb"]
    E = enc.encode_mentions(m, ["l"], ["r"])
    for strat in ("greedy", "feature", "threestep"):
        out = run_clusterer(strat, [7], m, E, ["l"], ["r"])
        assert len(out) == 1 and out[0].mention_ids == [7]
    try:
        run_clusterer("nope", [7], m, E)
        assert False
    except ValueError:
        pass


def test_cosine_distance_matrix():
    X = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 0.0]])
    d = cosine_distance_matrix(X)
    assert abs(d[0, 2]) < 1e-12
    assert abs(d[0, 1] - 1.0) < 1e-12


def test_tfidf_prefit_transform_drops_unseen_and_keeps_fit_idf():
    import numpy as np

    from raykg.cluster import TfidfModel, _tokenize_words, fit_tfidf

    fit_docs = [_tokenize_words(t) for t in
                ["alpha beta gamma", "beta gamma", "gamma delta"]]
    model = fit_tfidf(fit_docs, use_idf=True, max_features=None)
    # unseen term "omega" contributes nothing; idf comes from the fit set
    X = model.transform([_tokenize_words("omega beta")])
    assert X.shape == (1, len(model.terms))
    nz = {model.terms[j] for j in np.flatnonzero(X[0])}
    assert nz == {"beta"}
    assert abs(np.linalg.norm(X[0]) - 1.0) < 1e-12
    # fit idf: df(beta)=2, n=3 -> ln(4/3)+1
    j = model.terms.index("beta")
    assert abs(model.idf[j] - (np.log(4 / 3) + 1)) < 1e-12


def test_feature_scores_prefit_vs_per_group():
    from raykg.cluster import feature_scores, fit_feature_vectorizers

    mentions = ["Acme Corp", "Acme Corp", "Zyx Labs"]
    contexts = ["bought by acme corp", "acme corp again", "zyx labs report"]
    vec = fit_feature_vectorizers(mentions, contexts)
    S_pre = feature_scores(mentions, contexts, vectorizers=vec)
    S_fit = feature_scores(mentions, contexts)
    # fitting on the same group must equal prefit-on-that-group
    import numpy as np

    assert np.allclose(S_pre, S_fit)
    assert S_pre[0, 1] > S_pre[0, 2]
