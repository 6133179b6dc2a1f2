"""Gene vocabulary interning and read tokenization.

The reference (amira/construct_gene.py:47-93) represents a stranded gene call
as a string "+name"/"-name" and identifies genes by sha256-of-pickle hashes.
Here the gene alphabet is interned into a dense int32 vocabulary once, on the
host, and every read becomes a vector of *signed* gene tokens:

    token = strand * gene_id,   gene_id >= 1,   0 = padding

so reverse-complementing a gene is unary negation and whole reads pack into
(R, Lmax) int32 tensors that feed the device-side gene-mer kernels.
"""

from __future__ import annotations

import numpy as np


class GeneVocab:
    """Bidirectional mapping between gene names and positive int32 ids."""

    def __init__(self):
        self._name_to_id: dict[str, int] = {}
        self._names: list[str] = [""]  # index 0 reserved for padding

    def __len__(self) -> int:
        return len(self._names) - 1

    def intern(self, name: str) -> int:
        gid = self._name_to_id.get(name)
        if gid is None:
            gid = len(self._names)
            self._name_to_id[name] = gid
            self._names.append(name)
        return gid

    def id_of(self, name: str) -> int:
        return self._name_to_id[name]

    def name_of(self, gid: int) -> str:
        return self._names[gid]

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_id

    # ---- stranded-string <-> signed-token conversions ----

    def encode_gene(self, stranded: str) -> int:
        """'+name' / '-name' -> signed token (interning the name)."""
        strand = stranded[0]
        if strand == "+":
            sign = 1
        elif strand == "-":
            sign = -1
        else:
            raise ValueError(f"missing strand for gene: {stranded!r}")
        name = stranded[1:].replace(" ", "_")
        if not name:
            raise ValueError(f"missing gene name: {stranded!r}")
        return sign * self.intern(name)

    def decode_gene(self, token: int) -> str:
        if token == 0:
            raise ValueError("cannot decode padding token 0")
        sign = "+" if token > 0 else "-"
        return sign + self._names[abs(int(token))]

    def encode_read(self, genes: list[str]) -> np.ndarray:
        return np.asarray([self.encode_gene(g) for g in genes], dtype=np.int32)

    def encode_reads_batch(self, reads: list[list[str]]) -> list[np.ndarray]:
        """Tokenize many reads at once (native C fast path when available)."""
        from amira_tpu.native import load as _load_native

        native = _load_native()
        if native is not None:
            try:
                toks, next_id, new_names = native.encode_reads(
                    reads, self._name_to_id, len(self._names)
                )
                self._names.extend(new_names)
                return [np.frombuffer(b, dtype=np.int32) for b in toks]
            except ValueError:
                raise
            except Exception:
                pass
        return [self.encode_read(g) for g in reads]

    def decode_read(self, tokens) -> list[str]:
        return [self.decode_gene(t) for t in np.asarray(tokens) if t != 0]


def reverse_tokens(tokens: np.ndarray) -> np.ndarray:
    """Reverse-complement of a gene list: reverse order, flip strands.

    Mirrors amira/construct_gene_mer.py:4-12 (define_rc_geneMer).
    """
    return -tokens[::-1]


def pack_reads(
    read_tokens: list[np.ndarray], pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length token vectors into a padded (R, Lmax) int32 array.

    Returns (tokens, lengths). Padding value is 0.
    """
    n = len(read_tokens)
    lengths = np.asarray([len(t) for t in read_tokens], dtype=np.int32)
    lmax = int(pad_to if pad_to is not None else (lengths.max() if n else 0))
    out = np.zeros((n, lmax), dtype=np.int32)
    for i, t in enumerate(read_tokens):
        out[i, : len(t)] = t
    return out, lengths


def pack_positions(
    read_positions: list[np.ndarray | None], lmax: int
) -> np.ndarray:
    """Pack per-gene (start, end) nucleotide positions into (R, Lmax, 2).

    Missing positions are encoded as -1.
    """
    n = len(read_positions)
    out = np.full((n, lmax, 2), -1, dtype=np.int64)
    for i, p in enumerate(read_positions):
        if p is None:
            continue
        p = np.asarray(p, dtype=np.int64).reshape(-1, 2)
        out[i, : len(p)] = p
    return out
