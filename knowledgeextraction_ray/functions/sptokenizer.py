"""Real SentencePiece-style unigram tokenizer over a committed vocab fixture.

The reference's MRC featurizer tokenizes with ALBERT's
``tokenization.FullTokenizer`` — a SentencePiece unigram model plus the
public XLNet/ALBERT glue (``/root/reference/knowledgeextractor/utils/
mrc_utils.py:124-131`` calls ``tokenizer.tokenize(tokenization.
preprocess_text(example.paragraph_text, remove_space=True, lower=False))``).
The ``sentencepiece`` library and the ALBERT model file are not in this
container, so this module implements the same PUBLIC algorithms directly:

- :func:`preprocess_text` — ALBERT ``tokenization.preprocess_text`` parity:
  optional whitespace collapse, ``\\`\\``/``''`` → ``"``, NFKD + strip
  combining marks, optional lowercase.
- :class:`SpUnigramModel` — SentencePiece's deterministic unigram
  ``EncodeAsPieces``: space → ``▁`` with the dummy-prefix space, then a
  Viterbi segmentation maximizing the sum of piece log-scores (ties broken
  toward the shorter final piece — strict improvement required — which is a
  fixed deterministic rule; the committed fixture's scores avoid ties).
  Characters with no vocab entry surface as single-char pieces at the unk
  penalty, exactly SentencePiece's unknown-surface behavior.
- :func:`encode_pieces` — the XLNet/ALBERT ``encode_pieces`` wrapper,
  including its trailing-``digit,`` re-split hack.
- :class:`FullSpTokenizer` — ``FullTokenizer(do_lower_case=True)`` analog:
  ``tokenize(text) = encode_pieces(model, preprocess_text(text,
  remove_space=False, lower=True))``.

The vocab fixture (``fixtures/sp_code.vocab``, SentencePiece ``.vocab`` TSV
format ``piece\\tscore``) is derived deterministically from the corpus
grammar by ``tools/build_sp_vocab.py`` and committed. One structural
invariant is enforced at load: no piece contains ``▁`` past position 0, so
a segmentation can never cross a word boundary and per-word Viterbi with a
word cache is exact (asserted in :meth:`SpUnigramModel.__init__`).
"""

from __future__ import annotations

import os
import unicodedata

SPIECE_UNDERLINE = "▁"

_FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "sp_code.vocab")


def preprocess_text(inputs: str, remove_space: bool = True,
                    lower: bool = False) -> str:
    """ALBERT ``tokenization.preprocess_text`` parity (public code)."""
    outputs = " ".join(inputs.strip().split()) if remove_space else inputs
    outputs = outputs.replace("``", '"').replace("''", '"')
    outputs = unicodedata.normalize("NFKD", outputs)
    outputs = "".join(c for c in outputs if not unicodedata.combining(c))
    if lower:
        outputs = outputs.lower()
    return outputs


class SpUnigramModel:
    """Deterministic unigram ``EncodeAsPieces`` over a piece→score vocab."""

    def __init__(self, vocab: dict[str, float], unk_penalty: float = 10.0):
        for p in vocab:
            if SPIECE_UNDERLINE in p[1:]:
                raise ValueError(
                    f"piece {p!r} has an interior {SPIECE_UNDERLINE} — "
                    "breaks the per-word segmentation invariant")
            if not p:
                raise ValueError("empty piece")
        self.scores = dict(vocab)
        self.max_len = max(len(p) for p in vocab)
        # SentencePiece convention: unknown pieces score below every known
        # piece by a fixed penalty
        self.unk_score = min(vocab.values()) - unk_penalty
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_vocab_file(cls, path: str = _FIXTURE) -> "SpUnigramModel":
        vocab: dict[str, float] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                piece, score = line.split("\t")
                vocab[piece] = float(score)
        return cls(vocab)

    def encode_as_pieces(self, text: str) -> list[str]:
        """SentencePiece normalization (collapse/strip extra whitespace,
        dummy-prefix space, space → ▁) + per-chunk Viterbi."""
        text = " ".join(text.split())
        if not text:
            return []
        s = (" " + text).replace(" ", SPIECE_UNDERLINE)
        # chunks: maximal "▁word" units (the no-interior-▁ invariant makes
        # per-chunk segmentation exact); cached per worker — corpus word
        # inventories are Zipf-bounded so the cache hit rate is ~100%
        out: list[str] = []
        for chunk in s.split(SPIECE_UNDERLINE)[1:]:
            out.extend(self._chunk_pieces(SPIECE_UNDERLINE + chunk))
        return out

    def _chunk_pieces(self, chunk: str) -> list[str]:
        hit = self._cache.get(chunk)
        if hit is not None:
            return hit
        if len(self._cache) > 1 << 16:
            self._cache.clear()
        n = len(chunk)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        back = [0] * (n + 1)
        scores, ml, unk = self.scores, self.max_len, self.unk_score
        for i in range(1, n + 1):
            b = NEG
            bl = 0
            for l in range(1, min(i, ml) + 1):
                sc = scores.get(chunk[i - l:i])
                if sc is None:
                    continue
                c = best[i - l] + sc
                if c > b:                      # strict > : ties keep the
                    b, bl = c, l               # shorter final piece
            if bl == 0:                        # unknown char surfaces alone
                b, bl = best[i - 1] + unk, 1
            best[i], back[i] = b, bl
        pieces: list[str] = []
        i = n
        while i > 0:
            l = back[i]
            pieces.append(chunk[i - l:i])
            i -= l
        pieces.reverse()
        self._cache[chunk] = pieces
        return pieces


def encode_pieces(model: SpUnigramModel, text: str) -> list[str]:
    """XLNet/ALBERT ``encode_pieces`` (public code): deterministic encode
    plus the trailing-``digit,`` piece re-split."""
    pieces = model.encode_as_pieces(text)
    new_pieces: list[str] = []
    for piece in pieces:
        if len(piece) > 1 and piece[-1] == "," and piece[-2].isdigit():
            cur_pieces = model.encode_as_pieces(
                piece[:-1].replace(SPIECE_UNDERLINE, ""))
            if piece[0] != SPIECE_UNDERLINE and cur_pieces and \
                    cur_pieces[0][0] == SPIECE_UNDERLINE:
                if len(cur_pieces[0]) == 1:
                    cur_pieces = cur_pieces[1:]
                else:
                    cur_pieces[0] = cur_pieces[0][1:]
            cur_pieces.append(piece[-1])
            new_pieces.extend(cur_pieces)
        else:
            new_pieces.append(piece)
    return new_pieces


class FullSpTokenizer:
    """``FullTokenizer(spm_model, do_lower_case=True)`` analog."""

    def __init__(self, model: SpUnigramModel | None = None,
                 do_lower_case: bool = True):
        self.model = model or SpUnigramModel.from_vocab_file()
        self.do_lower_case = do_lower_case

    def tokenize(self, text: str) -> list[str]:
        return encode_pieces(
            self.model,
            preprocess_text(text, remove_space=False,
                            lower=self.do_lower_case))


_DEFAULT: FullSpTokenizer | None = None


def sp_tokenize_real(text: str) -> list[str]:
    """Module-level tokenize over the committed fixture model (lazy
    singleton — one vocab load per worker process)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = FullSpTokenizer()
    return _DEFAULT.tokenize(text)
