"""`tokenizer.bin` parser + greedy BPE encoder.

Binary format (llama2.ts:442-449):

    i32 max_token_length
    vocab_size x ( f32 score, i32 len, `len` utf-8 bytes )

Encoding reproduces the reference's greedy merge loop (llama2.ts:305-344)
*exactly*, including its tie rules:

* Seed tokens are per-UTF-16-code-unit vocabulary lookups — JS ``charAt``
  iterates UTF-16 units (llama2.ts:308-312); unknown characters raise.
* ``vocab.indexOf`` returns the FIRST matching index; the vocab can contain
  duplicate strings (all raw bytes 0x80-0xFF decode to U+FFFD under
  TextDecoder), so lookups map string -> lowest id.
* Each round merges the adjacent pair whose merged token has the strictly
  highest score (``>`` at llama2.ts:324) — ties go to the earliest pair.

The reference does this with O(V) linear scans per lookup; we use hash maps —
same results, ~1000x faster on long prompts (SURVEY §3.4).
"""

from __future__ import annotations

import os
import struct
from typing import Sequence

BOS = 1  # sentencepiece <s> (llama2.ts:463)
EOS = 2  # </s> — the reference never special-cases it; generation stops on BOS


def _utf16_units(text: str) -> list[str]:
    """Split text the way JS ``charAt`` does: one UTF-16 code unit per entry."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp > 0xFFFF:  # split astral code points into surrogate halves
            cp -= 0x10000
            out.append(chr(0xD800 + (cp >> 10)))
            out.append(chr(0xDC00 + (cp & 0x3FF)))
        else:
            out.append(ch)
    return out


class Tokenizer:
    def __init__(self, vocab: Sequence[str], scores: Sequence[float],
                 raw_bytes: Sequence[bytes] | None = None):
        if len(vocab) != len(scores):
            raise ValueError("vocab/scores length mismatch")
        self.vocab = list(vocab)
        self.scores = [float(s) for s in scores]
        # Original on-disk bytes per token.  Decoding maps invalid utf-8
        # (raw bytes 0x80-0xFF) to U+FFFD, which is lossy — save() writes
        # these originals so load->save round-trips bit-exactly (ADVICE r1).
        self.raw_bytes = list(raw_bytes) if raw_bytes is not None else [
            t.encode("utf-8") for t in self.vocab]
        self._native = None  # lazy native encoder; False = unavailable
        # string -> FIRST index, mirroring Array.prototype.indexOf
        self._index: dict[str, int] = {}
        for i, tok in enumerate(self.vocab):
            self._index.setdefault(tok, i)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # ---- binary IO ----
    @classmethod
    def load(cls, path: str | os.PathLike, vocab_size: int = 32000) -> "Tokenizer":
        with open(path, "rb") as f:
            data = f.read()
        pos = 4  # skip i32 max_token_length (ignored, llama2.ts:445)
        vocab, scores, raws = [], [], []
        for _ in range(vocab_size):
            (score,) = struct.unpack_from("<f", data, pos)
            (n,) = struct.unpack_from("<i", data, pos + 4)
            raw = data[pos + 8 : pos + 8 + n]
            pos += 8 + n
            scores.append(score)
            raws.append(raw)
            # TextDecoder('utf-8') semantics: invalid sequences -> U+FFFD
            vocab.append(raw.decode("utf-8", errors="replace"))
        return cls(vocab, scores, raw_bytes=raws)

    def save(self, path: str | os.PathLike) -> None:
        enc = self.raw_bytes
        with open(path, "wb") as f:
            f.write(struct.pack("<i", max((len(e) for e in enc), default=0)))
            for score, raw in zip(self.scores, enc):
                f.write(struct.pack("<fi", score, len(raw)))
                f.write(raw)

    # ---- encode (llama2.ts:305-344 semantics) ----
    def encode(self, text: str, bos: bool = False, eos: bool = False) -> list[int]:
        native = self._get_native()
        if native is not None:
            tokens = native.encode(text)
            if bos:
                tokens.insert(0, BOS)
            if eos:
                tokens.append(EOS)
            return tokens
        return self._encode_py(text, bos=bos, eos=eos)

    def _get_native(self):
        """Native C++ encoder (native/bpe.cpp via ctypes), lazily built;
        exact same semantics as _encode_py (tests assert equality)."""
        if self._native is False:
            return None
        if self._native is None:
            try:
                from tpu_llama.io.fast_bpe import NativeBpe

                self._native = NativeBpe(self.vocab, self.scores)
            except Exception:
                self._native = False
                return None
        return self._native

    def _encode_py(self, text: str, bos: bool = False, eos: bool = False) -> list[int]:
        tokens: list[int] = []
        for ch in _utf16_units(text):
            tid = self._index.get(ch)
            if tid is None:
                # llama2.ts:310 throws on unknown characters
                raise ValueError(f"character not found in vocab: {ch!r}")
            tokens.append(tid)

        while True:
            best_score = -1e10
            best_id = -1
            best_idx = -1
            for i in range(len(tokens) - 1):
                merged = self.vocab[tokens[i]] + self.vocab[tokens[i + 1]]
                tid = self._index.get(merged)
                if tid is not None and self.scores[tid] > best_score:
                    best_score = self.scores[tid]
                    best_id = tid
                    best_idx = i
            if best_idx == -1:
                break
            tokens[best_idx : best_idx + 2] = [best_id]

        if bos:
            tokens.insert(0, BOS)
        if eos:
            tokens.append(EOS)
        return tokens

    # ---- decode ----
    def decode_token(self, token: int, prev_token: int = 0) -> str:
        """Detokenize one token with the reference's BOS-space rule.

        After a BOS, sentencepiece strips one leading space (llama2.ts:502).
        """
        s = self.vocab[token]
        if prev_token == BOS and s.startswith(" "):
            s = s[1:]
        return s

    def decode(self, tokens: Sequence[int], prev_token: int = BOS) -> str:
        out = []
        prev = prev_token
        for t in tokens:
            out.append(self.decode_token(t, prev))
            prev = t
        return "".join(out)


def make_byte_tokenizer(extra: Sequence[tuple[str, float]] = ()) -> Tokenizer:
    """A minimal synthetic tokenizer for tests: llama2.c-style layout.

    Token 0-2: <unk>, BOS, EOS markers; tokens 3..258: raw bytes 0x00-0xFF
    (decoded with utf-8/replace, exactly as the real tokenizer.bin stores
    them); then caller-provided merge tokens with scores.
    """
    vocab = ["<unk>", "\n<s>\n", "\n</s>\n"]
    scores = [0.0, 0.0, 0.0]
    raws = [t.encode("utf-8") for t in vocab]
    for b in range(256):
        vocab.append(bytes([b]).decode("utf-8", errors="replace"))
        raws.append(bytes([b]))  # save() writes the raw byte, not U+FFFD
        scores.append(-1e6)  # byte fallbacks: effectively never merged into
    for tok, score in extra:
        vocab.append(tok)
        raws.append(tok.encode("utf-8"))
        scores.append(score)
    return Tokenizer(vocab, scores, raw_bytes=raws)
