"""transformers-backed biencoder adapter for the encoder seam
(``spec="hf"``) — the class a user points at REAL weights to run the
reference's workload (BERT-large biencoder towers,
``pipeline/biencoder/blink/biencoder/biencoder.py:73-133``) on this
engine.

The sandbox ships neither torch nor the 2.5 GB checkpoints, so the
import is LAZY and fails with a clear message; the seam itself —
sub-word tokenization feeding the reference's windowing arithmetic
(``data_process.py:26-69``), BLINK sequence layout, batched pooled
inference, projection to the pipeline dim — is exercised by
dependency-injected test doubles (tests/test_hf_encoder.py), and runs
with the real libraries when they are present (the same test module's
skipif-guarded case).

Faithfulness notes vs the reference:
- tokenize() is the REAL tokenizer's sub-word ``tokenize``; the quota
  balancing (``balance_context_window``) therefore operates on
  wordpiece counts exactly as ``data_process.py:45-57`` does on
  BertTokenizer output.
- mention layout: ``[CLS] left [E1] mention [E2] right [SEP]``
  (``data_process.py:26-43``; the entity tags map to the tokenizer's
  reserved unused tokens when available, else stay literal specials
  the tokenizer learns as UNK — documented divergence).
- entity layout: ``[CLS] title [TTL] descr [SEP]`` truncated by
  ``truncate_candidate`` (``data_process.py:71-89``).
- pooling: the [CLS] last-hidden state. BLINK adds one trained linear
  ``additional_linear`` on top (``biencoder.py:116-133``); that layer
  ships with the checkpoint, not the base model, so this adapter
  instead projects to the pipeline dim with a seeded deterministic
  Johnson-Lindenstrauss matrix (identity when dims already match) and
  L2-normalizes — score SCALE differs from BLINK's raw dot products,
  ranking structure is preserved.

Scale shape: the model loads once per actor in
``MentionEncoder.__init__`` (pass ``spec="hf"``), inference is batched
(``infer_batch`` rows per forward), CPU by default — ``device`` forwards
to torch for GPU clusters.
"""

from __future__ import annotations

import numpy as np

from raykg.encode import (
    DIM,
    VEC_SCALE,
    HashEncoder,
    _l2_normalize,
    balance_context_window,
    truncate_candidate,
)


class TransformersBiencoder(HashEncoder):
    """Real-tokenizer, real-model encoder behind the seam.

    ``model``/``tokenizer`` may be injected (tests, pre-loaded shared
    instances); otherwise they load from ``model_name`` via
    transformers — once per constructing actor."""

    MIN_CHARS_PER_TOKEN = 1  # sub-word: one char can be one piece

    ENT_START = "[unused0]"   # BLINK's mention tags
    ENT_END = "[unused1]"
    TITLE_TAG = "[unused2]"

    def __init__(self, dim: int = DIM, scale: float = VEC_SCALE,
                 max_seq_length: int | None = 128,
                 model_name: str = "bert-base-uncased",
                 device: str = "cpu", infer_batch: int = 64,
                 seed: int = 7, model=None, tokenizer=None):
        super().__init__(dim=dim, scale=scale,
                         max_seq_length=max_seq_length)
        if model is None or tokenizer is None:
            try:
                import torch  # noqa: F401
                from transformers import AutoModel, AutoTokenizer
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "encoder spec 'hf' needs the optional torch + "
                    "transformers dependencies (not shipped in this "
                    "sandbox); install them and point model_name at "
                    "the biencoder checkpoint"
                ) from e
            tokenizer = AutoTokenizer.from_pretrained(model_name)
            model = AutoModel.from_pretrained(model_name)
            model.eval()
            model.to(device)
        self._tok = tokenizer
        self._model = model
        self._device = device
        self._infer_batch = int(infer_batch)
        self._seed = seed
        self._proj: np.ndarray | None = None  # built on first output

    # ---- the tokenize seam: REAL sub-word pieces ----
    def tokenize(self, text: str) -> list[str]:
        return self._tok.tokenize(text or "")

    # ---- sequence building (reference layouts) ----
    def _mention_tokens(self, mention, left, right) -> list[str]:
        msl = self.max_seq_length or 128
        mt = self.tokenize(mention or "")
        lt, rt = self.tokenize(left or ""), self.tokenize(right or "")
        if len(lt) + len(rt) + len(mt) + 2 > msl:
            lt, rt = balance_context_window(len(mt) + 2, lt, rt, msl)
        return lt + [self.ENT_START] + mt + [self.ENT_END] + rt

    def _entity_tokens(self, title, descr) -> list[str]:
        msl = self.max_seq_length or 128
        tt, dt = truncate_candidate(
            self.tokenize(title or ""), self.tokenize(descr or ""), msl
        )
        return tt + [self.TITLE_TAG] + dt

    # ---- batched inference ----
    def _forward_ids(self, ids_mat: np.ndarray,
                     mask_mat: np.ndarray) -> np.ndarray:
        """(b, L) ids/mask -> (b, hidden) CLS states as numpy."""
        try:
            import torch
        except ImportError:
            # injected numpy test double (torch absent): the model is
            # called with numpy arrays and returns numpy hidden states
            out = self._model(input_ids=ids_mat,
                              attention_mask=mask_mat)
            return np.asarray(out.last_hidden_state)[:, 0, :].astype(
                np.float32)
        with torch.no_grad():
            out = self._model(
                input_ids=torch.as_tensor(ids_mat,
                                          device=self._device),
                attention_mask=torch.as_tensor(mask_mat,
                                               device=self._device),
            )
        h = out.last_hidden_state
        return h[:, 0, :].cpu().numpy().astype(np.float32)

    def _encode_token_lists(self, token_lists: list[list[str]]):
        tok = self._tok
        cls_tok = getattr(tok, "cls_token", "[CLS]") or "[CLS]"
        sep_tok = getattr(tok, "sep_token", "[SEP]") or "[SEP]"
        pad_id = getattr(tok, "pad_token_id", 0) or 0
        msl = self.max_seq_length or 128
        n = len(token_lists)
        pooled_parts = []
        for lo in range(0, n, self._infer_batch):
            chunk = token_lists[lo:lo + self._infer_batch]
            id_rows = [
                np.asarray(
                    tok.convert_tokens_to_ids(
                        [cls_tok] + toks[:msl - 2] + [sep_tok]
                    ),
                    dtype=np.int64,
                )
                for toks in chunk
            ]
            L = max(1, max(len(r) for r in id_rows))
            ids = np.full((len(chunk), L), pad_id, dtype=np.int64)
            mask = np.zeros((len(chunk), L), dtype=np.int64)
            for i, r in enumerate(id_rows):
                ids[i, :len(r)] = r
                mask[i, :len(r)] = 1
            pooled_parts.append(self._forward_ids(ids, mask))
        pooled = (np.concatenate(pooled_parts) if pooled_parts
                  else np.zeros((0, self.dim), dtype=np.float32))
        return _l2_normalize(self._project(pooled), self.scale)

    def _project(self, pooled: np.ndarray) -> np.ndarray:
        hidden = pooled.shape[1] if pooled.ndim == 2 and len(pooled) else self.dim
        if hidden == self.dim:
            return pooled
        if self._proj is None or self._proj.shape[0] != hidden:
            rng = np.random.default_rng(self._seed)
            self._proj = (
                rng.standard_normal((hidden, self.dim))
                / np.sqrt(self.dim)
            ).astype(np.float32)
        return pooled @ self._proj

    # ---- seam API ----
    def encode_mentions(self, mentions, context_left,
                        context_right) -> np.ndarray:
        return self._encode_token_lists([
            self._mention_tokens(m, l, r)
            for m, l, r in zip(mentions, context_left, context_right)
        ])

    def encode_entities(self, titles, descrs) -> np.ndarray:
        return self._encode_token_lists([
            self._entity_tokens(t, d) for t, d in zip(titles, descrs)
        ])
