"""TransformersBiencoder (raykg/hf.py, encoder spec "hf"): the seam a
user points at real BLINK-style weights. torch/transformers are absent
in this sandbox, so the seam arithmetic — REAL sub-word tokenize()
feeding data_process.py:26-69 windowing, BLINK sequence layouts,
batched pooled inference, dim projection — is exercised with
dependency-injected numpy doubles; the real-weights parity case is
skipif-guarded on torch + a local checkpoint."""

import importlib.util
import zlib

import numpy as np
import pytest

from raykg.encode import balance_context_window, truncate_candidate
from raykg.hf import TransformersBiencoder

HAS_TORCH = importlib.util.find_spec("torch") is not None


class FakeTokenizer:
    """BertTokenizer-shaped double: greedy 2-char sub-word pieces, so
    sub-word counts genuinely exceed whitespace counts (the property
    the windowing arithmetic must see)."""

    cls_token = "[CLS]"
    sep_token = "[SEP]"
    pad_token_id = 0

    def tokenize(self, text):
        out = []
        for w in (text or "").split():
            out.append(w[:2])
            for i in range(2, len(w), 2):
                out.append("##" + w[i:i + 2])
        return out

    def convert_tokens_to_ids(self, tokens):
        # crc32, not hash(): Python string hashing is randomized per
        # process, which would make the embeddings (and any tolerance
        # margin) vary run to run
        return [1 + (zlib.crc32(t.encode()) % 30000) for t in tokens]


class FakeModel:
    """Returns deterministic hidden states derived from the input ids
    (so two identical sequences embed identically and different ones
    differ)."""

    hidden = 96

    def __call__(self, input_ids, attention_mask):
        ids = np.asarray(input_ids, dtype=np.float64)
        mask = np.asarray(attention_mask, dtype=np.float64)
        b, L = ids.shape
        pos = np.arange(1, L + 1, dtype=np.float64)
        base = (ids * mask) @ np.outer(
            pos, np.arange(1, self.hidden + 1, dtype=np.float64) % 7 + 1
        )

        class Out:
            last_hidden_state = np.repeat(
                np.sin(base * 1e-4)[:, None, :], 2, axis=1
            )

        return Out()


def _enc(msl=32, dim=16):
    return TransformersBiencoder(
        dim=dim, max_seq_length=msl, model=FakeModel(),
        tokenizer=FakeTokenizer(),
    )


def test_windowing_runs_on_subword_counts():
    # whitespace-token count fits the budget, sub-word count does not:
    # the adapter must window (data_process.py:45-57 arithmetic on
    # wordpiece counts), reproducing balance_context_window exactly
    enc = _enc(msl=16)
    tok = FakeTokenizer()
    mention = "alpha"
    left = "leftcontextword " * 6       # 6 words -> 24+ pieces
    right = "rightcontextword " * 6
    got = enc._mention_tokens(mention, left, right)
    mt = tok.tokenize(mention)
    lt, rt = tok.tokenize(left), tok.tokenize(right)
    kl, kr = balance_context_window(len(mt) + 2, lt, rt, 16)
    want = kl + [enc.ENT_START] + mt + [enc.ENT_END] + kr
    assert got == want
    assert len(got) <= 16


def test_entity_truncation_matches_candidate_tokenizer():
    enc = _enc(msl=12)
    tok = FakeTokenizer()
    title, descr = "organization name", "a very long description " * 5
    got = enc._entity_tokens(title, descr)
    tt, dt = truncate_candidate(tok.tokenize(title), tok.tokenize(descr),
                                12)
    assert got == tt + [enc.TITLE_TAG] + dt
    assert len(got) <= 12 - 1  # [CLS]/[SEP] slots stay free


def test_encode_shapes_norms_and_determinism():
    enc = _enc(msl=32, dim=16)
    m = ["Acme Corp", "Beta LLC", "Acme Corp"]
    l = ["we signed with", "the contract for", "we signed with"]
    r = ["last week", "was renewed", "last week"]
    out = enc.encode_mentions(m, l, r)
    assert out.shape == (3, 16) and out.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 10.0,
                               rtol=1e-5)
    # identical rows embed identically (up to BLAS summation-order
    # noise: row position in the GEMM and the thread split — which
    # varies with machine load — both change the reduction order, so
    # atol must cover near-zero elements); distinct rows don't
    np.testing.assert_allclose(out[0], out[2], rtol=1e-4, atol=1e-5)
    assert not np.allclose(out[0], out[1], rtol=1e-4, atol=1e-5)
    out2 = _enc(msl=32, dim=16).encode_mentions(m, l, r)
    np.testing.assert_allclose(out, out2, rtol=1e-4, atol=1e-5)
    ents = enc.encode_entities(["Acme Corp"], ["a supplier of anvils"])
    assert ents.shape == (1, 16)


def test_infer_batching_is_invisible():
    enc_big = _enc(msl=32, dim=16)
    enc_small = _enc(msl=32, dim=16)
    enc_small._infer_batch = 2
    m = [f"Entity {i}" for i in range(7)]
    l = ["left context here"] * 7
    r = ["right context there"] * 7
    np.testing.assert_allclose(
        enc_big.encode_mentions(m, l, r),
        enc_small.encode_mentions(m, l, r), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(HAS_TORCH, reason="torch present: error path n/a")
def test_make_encoder_hf_raises_helpfully_without_torch():
    from raykg.encode import make_encoder

    with pytest.raises(ImportError, match="torch"):
        make_encoder("hf", dim=16)


@pytest.mark.skipif(
    not HAS_TORCH, reason="optional dependency: torch/transformers"
)
def test_hf_real_model_smoke(tmp_path):
    """With real torch installed (and a local checkpoint via
    RAYKG_HF_MODEL to avoid network), the adapter loads once and
    encodes — the same gate shape as test_tiny_transformer_parity's
    seam proof, with the REAL tokenizer class driving the
    data_process.py:26-69 arithmetic."""
    import os

    name = os.environ.get("RAYKG_HF_MODEL")
    if not name:
        pytest.skip("set RAYKG_HF_MODEL to a local checkpoint path")
    enc = TransformersBiencoder(dim=64, max_seq_length=48,
                                model_name=name)
    out = enc.encode_mentions(["Acme Corp"], ["we met"], ["today"])
    assert out.shape == (1, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 10.0,
                               rtol=1e-4)
