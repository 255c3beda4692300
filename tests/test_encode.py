import numpy as np
import pyarrow as pa

from raykg.encode import (
    HashEncoder,
    MentionEncoder,
    column_to_vectors,
    vectors_to_column,
)
from raykg.schema import DIM, VEC_SCALE


def test_determinism_and_norm():
    enc = HashEncoder()
    a = enc.encode_mentions(["Zorblax Dynamics"], ["left ctx"], ["right ctx"])
    b = enc.encode_mentions(["Zorblax Dynamics"], ["left ctx"], ["right ctx"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, DIM)
    assert abs(np.linalg.norm(a) - VEC_SCALE) < 1e-3


def test_similarity_structure():
    enc = HashEncoder()
    m = enc.encode_mentions(
        ["Zorblax Dynamics", "Zorblax Dynamics", "Falu Nedo"],
        ["ctx one", "totally different", "x"],
        ["a", "b", "y"],
    )
    same = float(m[0] @ m[1])
    diff = float(m[0] @ m[2])
    assert same > 90.0  # same surface, different context
    assert diff < 40.0
    e = enc.encode_entities(
        ["Zorblax Dynamics"], ["Zorblax Dynamics is a company"]
    )
    assert float(m[0] @ e[0]) > 90.0


def test_empty_and_edge_inputs():
    enc = HashEncoder()
    out = enc.encode_mentions([], [], [])
    assert out.shape == (0, DIM)
    out = enc.encode_mentions(["", "a"], ["", ""], ["", ""])
    assert out.shape == (2, DIM)
    assert np.isfinite(out).all()


def test_vector_column_roundtrip():
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    col = vectors_to_column(mat)
    back = column_to_vectors(col)
    np.testing.assert_array_equal(mat, back)
    # plain (non-fixed-size) list column path
    plain = pa.array([[0.0, 1.0], [2.0, 3.0]], type=pa.list_(pa.float32()))
    back2 = column_to_vectors(plain)
    np.testing.assert_array_equal(back2, [[0, 1], [2, 3]])


def test_mention_encoder_stage():
    batch = pa.table(
        {
            "mention": ["Zorblax Dynamics", "Falu Nedo"],
            "context_left": ["we asked about ", "from "],
            "context_right": [" today", " yesterday"],
        }
    )
    out = MentionEncoder()(batch)
    assert out.column("encoding").type == pa.list_(pa.float32(), DIM)
    direct = HashEncoder().encode_mentions(
        ["Zorblax Dynamics", "Falu Nedo"],
        ["we asked about ", "from "],
        [" today", " yesterday"],
    )
    np.testing.assert_array_equal(column_to_vectors(out.column("encoding")), direct)
