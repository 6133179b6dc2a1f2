"""Per-path assembly of the full reads assigned to each AMR gene copy.

The reference optionally shells out to Flye (`--assemble-paths`,
result_utils.py:1267-1288). Here assembly is a greedy overlap-layout-
consensus pipeline built on the in-process kernels:

  1. all-vs-all overlap detection by shared-k-mer diagonal voting (the
     minimap-style seeding already used by ops/align.py), both strands;
  2. a consistent orientation pass (BFS over the strongest overlaps);
  3. contained-read removal and greedy dovetail layout (best overlap first,
     one link per read end, union-find against cycles);
  4. per-contig draft construction from the voted offsets, then iterative
     polishing against the contig's reads with the device consensus kernel
     (ops/consensus.polish — batched banded SW on TPU).

Unlike the earlier backbone-polish stopgap this assembles past the longest
read: contigs span chains of dovetail overlaps. Repeat resolution beyond
greedy tie-breaking (Flye's repeat graph) is out of scope; tangled layouts
fall apart into shorter contigs rather than misassemble.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np

from amira_tpu.io import parse_fastq, write_fasta
from amira_tpu.ops.align import (
    _forward_kmers,
    build_ref_seed_index,
    reverse_complement,
)
from amira_tpu.ops.consensus import polish
from amira_tpu.sketch import encode_dna

_SENTINEL = np.uint64(1) << np.uint64(62)


def _vote_overlaps(seqs: dict, k: int = 15, bin_width: int = 128,
                   min_votes: int = 6, max_occ: int = 16):
    """Candidate pairwise overlaps by shared-k-mer diagonal voting.

    Returns {(a, b, strand): (offset, votes)} with a < b in id order;
    strand '+' means b forward vs a forward, '-' means b forward vs rc(a).
    offset is the voted diagonal: pos_in_b - pos_in_a (a in the given
    orientation)."""
    ids = list(seqs)
    codes = {r: encode_dna(seqs[r]) for r in ids}
    # one concatenated seed index over all forward reads
    offsets, owner_bounds = [], []
    cat = []
    cursor = 0
    for r in ids:
        cat.append(codes[r])
        owner_bounds.append((cursor, cursor + len(codes[r])))
        cursor += len(codes[r]) + k  # gap so windows never span two reads
        cat.append(np.full(k, 255, dtype=np.uint8))
    cat = np.concatenate(cat) if cat else np.zeros(0, dtype=np.uint8)
    idx_kmers, idx_pos = build_ref_seed_index(cat, k=k)
    starts_arr = np.array([b[0] for b in owner_bounds], dtype=np.int64)
    ends_arr = np.array([b[1] for b in owner_bounds], dtype=np.int64)

    results: dict = {}
    for qi, r in enumerate(ids):
        for strand, qcodes in (
            ("+", codes[r]),
            ("-", encode_dna(reverse_complement(seqs[r]))),
        ):
            qk = _forward_kmers(qcodes, k)
            qpos = np.nonzero(qk != _SENTINEL)[0]
            qk = qk[qpos]
            if len(qk) == 0 or len(idx_kmers) == 0:
                continue
            lo = np.searchsorted(idx_kmers, qk, side="left")
            hi = np.searchsorted(idx_kmers, qk, side="right")
            counts = hi - lo
            keep = (counts > 0) & (counts <= max_occ)
            if not keep.any():
                continue
            reps = counts[keep]
            total = int(reps.sum())
            starts = np.repeat(lo[keep], reps)
            base = np.concatenate([[0], np.cumsum(reps)[:-1]])
            within = np.arange(total, dtype=np.int64) - np.repeat(base, reps)
            abs_pos = idx_pos[starts + within]
            tgt = np.searchsorted(ends_arr, abs_pos, side="right")
            rel_pos = abs_pos - starts_arr[tgt]
            diag = rel_pos - np.repeat(qpos[keep], reps)
            not_self = tgt != qi
            tgt, diag = tgt[not_self], diag[not_self]
            if len(tgt) == 0:
                continue
            # votes per (target, diagonal bin); merge the two adjacent bins
            # around the winner so indel drift across a long overlap doesn't
            # split the vote
            dbin = diag // bin_width
            key = tgt * np.int64(1 << 32) + (dbin & np.int64(0xFFFFFFFF))
            order = np.argsort(key, kind="stable")
            key_s, diag_s, tgt_s = key[order], diag[order], tgt[order]
            bounds = np.concatenate(
                [[0], np.nonzero(np.diff(key_s))[0] + 1, [len(key_s)]]
            )
            per_tgt: dict = {}
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                t = int(tgt_s[b0])
                if t == qi:
                    continue
                n = int(b1 - b0)
                best = per_tgt.get(t)
                if best is None or n > best[0]:
                    per_tgt[t] = (n, b0, b1)
            for t, (n, b0, b1) in per_tgt.items():
                # gather votes within +-1 bin of the winner
                center = diag_s[b0:b1]
                med = int(np.median(center))
                near = (tgt == t) & (np.abs(diag - med) <= bin_width)
                votes = int(near.sum())
                if votes < min_votes:
                    continue
                off = int(np.median(diag[near]))
                a, b = sorted((qi, t))
                if a == qi:
                    entry = (off, votes, strand)
                else:
                    # normalize to a < b: b-vs-a offset with a oriented.
                    # '+': symmetric, offset flips sign. '-': rc(q) vs t ==
                    # rc(t) vs q at mirrored offset; fold to t fwd vs rc(q).
                    if strand == "+":
                        entry = (-off, votes, "+")
                    else:
                        La = len(seqs[ids[a]])
                        Lq = len(seqs[r])
                        entry = (Lq - La + off, votes, "-")
                cur = results.get((a, b))
                if cur is None or votes > cur[1]:
                    results[(a, b)] = entry
    return ids, results


def _orient_reads(ids, overlaps):
    """Assign a consistent orientation per read: BFS over overlaps in
    descending vote order, flipping when the linking overlap is '-'."""
    adj = defaultdict(list)
    for (a, b), (off, votes, strand) in overlaps.items():
        adj[a].append((votes, b, strand))
        adj[b].append((votes, a, strand))
    orient = {}
    for seed in range(len(ids)):
        if seed in orient:
            continue
        orient[seed] = +1
        stack = [seed]
        while stack:
            u = stack.pop()
            for _votes, v, strand in sorted(adj[u], reverse=True):
                want = orient[u] * (1 if strand == "+" else -1)
                if v not in orient:
                    orient[v] = want
                    stack.append(v)
    return orient


def _offsets_oriented(seqs_o: dict, ids, k=15, bin_width=128, min_votes=6):
    """Second voting pass on consistently-oriented strings: forward-only
    offsets pos_in_b - pos_in_a per pair."""
    _ids, res = _vote_overlaps(
        {r: seqs_o[r] for r in ids}, k=k, bin_width=bin_width,
        min_votes=min_votes,
    )
    out = {}
    for (a, b), (off, votes, strand) in res.items():
        if strand != "+":
            continue  # inconsistent orientation remnant; drop
        out[(a, b)] = (off, votes)
    return out


def assemble_reads(reads: dict, k: int = 15, min_votes: int = 6,
                   min_overlap: int = 100, polish_iterations: int = 3,
                   band_width: int = 512):
    """Greedy OLC assembly of {read_id: sequence}. Returns a list of
    (contig_sequence, [read ids]) sorted by length descending."""
    reads = {r: s for r, s in reads.items() if len(s) >= k}
    if not reads:
        return []
    ids, votes = _vote_overlaps(reads, k=k, min_votes=min_votes)
    orient = _orient_reads(ids, votes)
    oriented = {
        r: (reads[r] if orient.get(i, 1) > 0 else reverse_complement(reads[r]))
        for i, r in enumerate(ids)
    }
    pair_off = _offsets_oriented(oriented, ids, k=k, min_votes=min_votes)

    lens = {i: len(oriented[ids[i]]) for i in range(len(ids))}
    # containment: b's span inside a (or vice versa) with slack
    contained: dict = {}  # read -> a read containing it
    dovetails = []
    for (a, b), (off, nv) in pair_off.items():
        La, Lb = lens[a], lens[b]
        # a[i] ~ b[i + off]
        olap = min(La, Lb - off) - max(0, -off)
        if olap < min_overlap:
            continue
        # slack tracks the voted offset's uncertainty (indel drift across
        # the overlap, ~a few percent), NOT the overlap size — too much
        # slack absorbs genuine short extensions into "containment"
        slack = max(20, olap // 25)
        if off >= -slack and off + La <= Lb + slack:
            inner = a if La <= Lb else b
            contained.setdefault(inner, b if inner == a else a)
        elif -off >= -slack and -off + Lb <= La + slack:
            inner = b if Lb <= La else a
            contained.setdefault(inner, a if inner == b else b)
        elif off > 0:
            # off = position of a's origin in b's frame, so b starts first
            dovetails.append((nv, b, a, off))  # b then a, a starts at off in b
        else:
            dovetails.append((nv, a, b, -off))  # a then b, b starts at -off in a

    dovetails = [d for d in dovetails
                 if d[1] not in contained and d[2] not in contained]
    dovetails.sort(key=lambda d: -d[0])

    right_link: dict = {}
    left_link: dict = {}
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for nv, u, v, t in dovetails:
        if u in right_link or v in left_link:
            continue
        if find(u) == find(v):
            continue
        right_link[u] = (v, t)
        left_link[v] = u
        parent[find(u)] = find(v)

    alive = [i for i in range(len(ids)) if i not in contained]
    heads = [i for i in alive if i not in left_link]
    # a contained read polishes the contig of the read that contains it
    # (resolved transitively to a placed read)
    containees: dict = defaultdict(list)
    for c, outer in contained.items():
        seen = {c}
        while outer in contained and outer not in seen:
            seen.add(outer)
            outer = contained[outer]
        containees[outer].append(c)
    contigs = []
    for h in heads:
        chain = [h]
        offs = [0]
        cur = h
        while cur in right_link:
            nxt, t = right_link[cur]
            offs.append(offs[-1] + t)
            chain.append(nxt)
            cur = nxt
        draft_end = 0
        draft_parts = []
        for i, off in zip(chain, offs):
            s = oriented[ids[i]]
            if off + len(s) > draft_end:
                draft_parts.append(s[max(0, draft_end - off):])
                draft_end = off + len(s)
        draft = "".join(draft_parts)
        members = [ids[i] for i in chain]
        pool = {ids[i]: reads[ids[i]] for i in chain}
        for i in chain:
            for c in containees.get(i, ()):
                pool[ids[c]] = reads[ids[c]]
        if len(pool) > 1:
            draft = polish(
                draft, pool,
                iterations=polish_iterations, band_width=band_width,
            )
        contigs.append((draft, members))
    contigs.sort(key=lambda c: -len(c[0]))
    return contigs


def assemble_path(fastq_path, out_dir, iterations=3, band_width=512):
    reads = parse_fastq(fastq_path)
    if not reads:
        return None
    contigs = assemble_reads(
        {r: v["sequence"] for r, v in reads.items()},
        polish_iterations=iterations, band_width=band_width,
    )
    if not contigs:
        return None
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "assembly.fasta")
    records = [
        f">contig_{n + 1} length={len(seq)} reads={len(members)}\n{seq}"
        for n, (seq, members) in enumerate(contigs)
    ]
    write_fasta(out_path, records)
    return out_path


def assemble_full_length_paths(output_dir, cores=1):
    """(result_utils.py:1267-1288)"""
    fastq_files = glob.glob(
        os.path.join(output_dir, "AMR_allele_fastqs", "path_reads", "*.fastq.gz")
    )
    assembly_dir = os.path.join(output_dir, "path_assemblies")
    os.makedirs(assembly_dir, exist_ok=True)
    for fastq_file in fastq_files:
        path_id = os.path.basename(fastq_file).replace(".fastq.gz", "")
        try:
            assemble_path(
                fastq_file, os.path.join(assembly_dir, f"path_{path_id}")
            )
        except Exception as e:  # match the reference's log-and-skip behavior
            sys.stderr.write(
                f"\namira-tpu: error assembling path {path_id}: {e}\n"
            )
            continue
