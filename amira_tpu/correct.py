"""Read correction: re-thread filtered reads through the surviving graph.

Reference semantics: amira/construct_graph.py:1123-1480. After nodes are
filtered, each affected read's node list has None holes; correction trims
boundary holes, searches bounded replacement paths between the flanking
surviving nodes, scores the candidate re-threadings by gene-set overlap with
the original read (ties by mean path coverage), and remaps per-gene
nucleotide positions through a Needleman-Wunsch alignment of old vs new gene
lists.
"""

from __future__ import annotations

from itertools import product

import numpy as np


def needleman_wunsch(x: list, y: list):
    """Global alignment of two symbol lists, score 1/0, gap -1.

    Returns a list of (x_sym | '*', y_sym | '*') columns, matching
    construct_graph.py:1433-1480 (including its tie-break preferences:
    DIAG > LEFT > UP by Python max over (score, direction) tuples — here we
    replicate by explicit priority ordering).
    """
    N, M = len(x), len(y)
    if N == 0:
        return [("*", b) for b in y]
    if M == 0:
        return [(a, "*") for a in x]
    # score matrix via numpy DP (row by row)
    F = np.zeros((N + 1, M + 1), dtype=np.int32)
    P = np.zeros((N + 1, M + 1), dtype=np.int8)  # 0=diag,1=left(gap in y),2=up(gap in x)
    F[0, :] = -np.arange(M + 1)
    F[:, 0] = -np.arange(N + 1)
    # match scores: intern symbols to ids so the (N, M) equality grid is an
    # integer compare, not N*M Python-level string comparisons
    ids: dict = {}
    xa = np.fromiter((ids.setdefault(s, len(ids)) for s in x), np.int32, N)
    ya = np.fromiter((ids.setdefault(s, len(ids)) for s in y), np.int32, M)
    eq = xa[:, None] == ya[None, :]
    # reference: option_F = (diag, F[i-1, j] - 1, F[i, j-1] - 1)
    #            option_Ptr = (DIAG, LEFT, UP)
    # max(zip(option_F, option_Ptr)) picks highest score; on ties it compares
    # direction tuples: UP (0,-1) > LEFT (-1,0) > DIAG (-1,-1).
    # The in-row dependency row[j] = max(dl[j], row[j-1]-1) unrolls into a
    # cumulative max, so each row is pure vector work.
    col_idx = np.arange(M + 1)
    A = np.empty(M + 1, dtype=np.int32)
    for i in range(1, N + 1):
        diag = F[i - 1, :-1] + eq[i - 1].astype(np.int32)
        left = F[i - 1, 1:] - 1
        dl = np.maximum(left, diag)  # tie -> LEFT over DIAG
        A[0] = -i
        A[1:] = dl + col_idx[1:]
        row = np.maximum.accumulate(A) - col_idx
        # tie -> UP over LEFT/DIAG
        up = row[:-1] - 1
        P[i, 1:] = np.where(up >= dl, 2, np.where(left >= diag, 1, 0))
        F[i] = row
    # traceback
    out = []
    i, j = N, M
    while i > 0 and j > 0:
        p = P[i, j]
        if p == 0:
            out.append((x[i - 1], y[j - 1]))
            i -= 1
            j -= 1
        elif p == 1:
            out.append((x[i - 1], "*"))
            i -= 1
        else:
            out.append(("*", y[j - 1]))
            j -= 1
    while i > 0:
        out.append((x[i - 1], "*"))
        i -= 1
    while j > 0:
        out.append(("*", y[j - 1]))
        j -= 1
    out.reverse()
    return out


def find_read_boundaries(read_nodes):
    start, end = 0, len(read_nodes) - 1
    for i, n in enumerate(read_nodes):
        if n:
            start = i
            break
    for i, n in enumerate(reversed(read_nodes)):
        if n:
            end = len(read_nodes) - 1 - i
            break
    return start, end


def identify_path_terminals(nodes, start, end):
    terminals = []
    path_start = None
    for i in range(len(nodes)):
        if start <= i <= end:
            if not nodes[i]:
                if nodes[i - 1]:
                    path_start = i - 1
                if nodes[i + 1]:
                    terminals.append((path_start, i + 1))
    return terminals


def _insert_elements_sequential(base_list, insert_dict):
    """Sequential delete/insert with running offsets — the original
    bookkeeping, kept as the fallback for span layouts the stitched fast
    path does not model (construct_graph.py:1166-1203)."""
    lists_with_keys = [
        [(key, element) for element in lst]
        for key, lst in insert_dict.items()
    ]
    results = []
    for combination in product(*lists_with_keys):
        lst = base_list[:]
        offset = 0
        for (s, e), path in combination:
            point = s + offset
            del lst[point : e + offset + 1]
            lst[point:point] = path
            offset += len(path) - (e - s + 1)
        results.append(lst)
    return results


def insert_elements(base_list, insert_dict):
    """Every combination of replacing each (start, end) span of
    `base_list` with one of its candidate paths (behavioral contract:
    construct_graph.py:1166-1203). Spans arrive in ascending position
    order from identify_path_terminals and ADJACENT spans may share a
    boundary index (consecutive bubbles share a junction node); under
    the sequential bookkeeping a later overlapping span trims the tail
    of the previous replacement, which the stitched expression below
    reproduces directly. Any layout outside that contract falls back to
    the sequential original."""
    if not insert_dict:
        return [base_list]
    spans = list(insert_dict)
    n = len(spans)
    # validate the ascending / non-nested contract once
    for i in range(1, n):
        if (
            spans[i][0] <= spans[i - 1][0]
            or spans[i][1] <= spans[i - 1][1]
        ):
            # out-of-order or nested spans: use the faithful fallback
            return _insert_elements_sequential(base_list, insert_dict)
    results = []
    for combo in product(*(insert_dict[sp] for sp in spans)):
        parts: list = [base_list[: spans[0][0]]]
        ok = True
        for i, ((s, e), path) in enumerate(zip(spans, combo)):
            if i + 1 < n:
                nxt_s = spans[i + 1][0]
                if nxt_s <= e:
                    trim = e - nxt_s + 1
                    if trim > len(path):
                        ok = False
                        break
                    parts.append(path[: len(path) - trim])
                else:
                    parts.append(path)
                    parts.append(base_list[e + 1 : nxt_s])
            else:
                parts.append(path)
                parts.append(base_list[e + 1 :])
        if not ok:
            return _insert_elements_sequential(base_list, insert_dict)
        results.append([x for seg in parts for x in seg])
    return results


def get_possible_paths(graph, nodes_on_read, replacement_dict):
    possible_middle = insert_elements(nodes_on_read, replacement_dict)
    out = []
    for corrected in possible_middle:
        path = [n[0] for n in corrected if n[0]]
        dirs = [n[1] for n in corrected if n[0]]
        out.append((path, dirs))
    return out


def replace_invalid_gene_positions(new_positions, fastq_data, read_id):
    """Interpolate (None, None) gene positions from neighbours
    (construct_graph.py:1669-1691)."""
    prev_end = 0
    for i, (start, end) in enumerate(new_positions):
        if end is not None:
            prev_end = end
        if start is None and end is None:
            next_start = None
            for j in range(i + 1, len(new_positions)):
                if new_positions[j][0] is not None:
                    next_start = new_positions[j][0]
                    break
            if prev_end is not None and next_start is not None:
                new_positions[i] = (prev_end, next_start)
            elif next_start is None and prev_end is not None:
                new_positions[i] = (
                    prev_end,
                    len(fastq_data[read_id]["sequence"]) - 1,
                )
            else:
                raise AttributeError("Could not find a valid gene start or end position.")
    return new_positions


def _coverage_of_path(graph, path):
    return float(np.mean([graph.get_node_by_hash(h).coverage for h in path]))


def process_read_correction(graph, read_id, read_nodes, start, end, fastq_data):
    nodes_on_read = [
        (read_nodes[read_id][i], graph.get_readNodeDirections()[read_id][i])
        for i in range(len(read_nodes[read_id]))
    ]
    terminals = identify_path_terminals(read_nodes[read_id], start, end)
    k = graph.get_kmerSize()
    if len(terminals) == 0:
        # only boundary holes: trim the read to the surviving span
        new_nodes = [n[0] for n in nodes_on_read[start : end + 1]]
        new_dirs = [n[1] for n in nodes_on_read[start : end + 1]]
        if graph.get_gene_positions():
            graph.get_gene_positions()[read_id] = graph.get_gene_positions()[read_id][
                start : end + k
            ]
        return graph.get_annotation_for_read(new_nodes, new_dirs, read_id)
    replacement_dict = {}
    for pair in terminals:
        paths = graph.new_find_paths_between_nodes(
            nodes_on_read[pair[0]][0],
            nodes_on_read[pair[1]][0],
            k * 2,
            nodes_on_read[pair[0]][1],
        )
        replacement_dict[pair] = paths
    possible_paths = get_possible_paths(graph, nodes_on_read, replacement_dict)
    if not possible_paths:
        return graph.get_reads()[read_id]
    original = graph.get_reads()[read_id]
    original_set = set(original)
    best_genes, best_overlap, best_cov = None, 0, 0.0
    for path, dirs in possible_paths:
        cov = _coverage_of_path(graph, path)
        genes = graph.get_annotation_for_read(path, dirs, read_id)
        overlap = len(set(genes) & original_set)
        if overlap > best_overlap or (overlap == best_overlap and cov > best_cov):
            best_genes, best_overlap, best_cov = genes, overlap, cov
    if best_genes is None:
        return original
    closest = best_genes
    # remap gene positions through an alignment of new vs old gene lists
    alignment = needleman_wunsch(closest, original)
    current = 0
    new_positions = []
    positions = graph.get_gene_positions()[read_id]
    for col in alignment:
        if col[0] != "*":
            if col[1] != col[0]:
                new_positions.append((None, None))
            else:
                new_positions.append(positions[current])
                current += 1
        else:
            current += 1
    new_positions = replace_invalid_gene_positions(new_positions, fastq_data, read_id)
    graph.get_gene_positions()[read_id] = new_positions
    return closest


def correct_single_read(graph, read_id, read_nodes, fastq_data):
    if read_id not in graph.get_reads_to_correct():
        return graph.get_reads()[read_id]
    if not all(n is None for n in read_nodes[read_id]):
        start, end = find_read_boundaries(read_nodes[read_id])
        new_genes = process_read_correction(
            graph, read_id, read_nodes, start, end, fastq_data
        )
        if graph.get_gene_positions():
            assert len(new_genes) == len(graph.get_gene_positions()[read_id])
        return new_genes
    return []


def correct_reads(graph, fastq_data):
    """Correct every read; returns (corrected_genes, corrected_positions)
    (construct_graph.py:1123-1134)."""
    read_nodes = graph.get_readNodes()
    corrected_genes = {}
    corrected_positions = {}
    for read_id in read_nodes:
        genes = correct_single_read(graph, read_id, read_nodes, fastq_data)
        if len(genes) > 0:
            corrected_genes[read_id] = genes
            if graph.get_gene_positions():
                corrected_positions[read_id] = graph.get_gene_positions()[read_id]
    return corrected_genes, corrected_positions
