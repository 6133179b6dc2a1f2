"""Tensor-resident graph cleaning: coverage filter, read correction and tip
trimming computed from a lazy GeneMerGraph's flat aggregation tables, without
ever materializing the Node/Edge object graph.

Reference semantics: amira/construct_graph.py:496-540 (filter_graph),
:1123-1480 (correct_reads), :679-720 (remove_short_linear_paths). The object
path in graph.py/correct.py implements the same operations on dict-of-object
structures; this module re-derives them from the arrays a cached build
aggregates anyway (amira_tpu/graph.py:_build_cached):

  * filter      = boolean mask over the unique-node coverage vector,
  * hole marking = vectorized membership of the per-read window-hash stream
    in the doomed-hash set (one np.isin over the concatenated occurrence
    stream instead of per-node per-read list scans),
  * correction  = amira_tpu/correct.py's own functions, run against a thin
    view (_TensorView) that answers the graph calls (DFS adjacency, node
    coverage, annotation decode) straight from the tables — so tie-break
    order, path enumeration order and position remapping are IDENTICAL to
    the object path by construction,
  * tip trimming = degree/linear-walk scan over CSR-style adjacency lists
    with the same first-edge semantics, tandem-repeat guard and
    whole-component guard as the object walk.

The per-iteration rebuild therefore costs one np.unique over the occurrence
stream plus work proportional to the few % of reads actually corrected;
nothing scales with graph size in Python-object land. Bubble popping
(amira_tpu/bubbles.py) still runs on the materialized object graph.
"""

from __future__ import annotations

import numpy as np

from amira_tpu.correct import correct_single_read


class _ReadListMap:
    """Lazy {read_id: per-window list with None holes} mapping.

    Only reads that actually get corrected ever build their list; iteration
    yields every kept read in build order (dict-order parity with
    graph._readNodes)."""

    def __init__(self, view, which):
        self._view = view
        self._which = which  # "nodes" | "dirs"
        self._built: dict = {}

    def __iter__(self):
        return iter(self._view.kept_ids)

    def __len__(self):
        return len(self._view.kept_ids)

    def __getitem__(self, rid):
        got = self._built.get(rid)
        if got is None:
            got = self._view._build_read_lists(rid)[0 if self._which == "nodes" else 1]
        return got

    def _store(self, rid, lst):
        self._built[rid] = lst


class _CovNode:
    __slots__ = ("coverage",)

    def __init__(self, coverage):
        self.coverage = coverage


class _TensorView:
    """Duck-typed stand-in for GeneMerGraph over the lazy tables, covering
    exactly the surface amira_tpu/correct.py touches.

    `doomed_mask` is a boolean vector over the sorted unique-node table `uh`
    (True = node removed), so hole marking is a single O(occurrences) gather
    through the occurrence→node inverse map — no per-read scans, no sorts."""

    def __init__(self, graph, doomed_mask: np.ndarray | None):
        self.graph = graph
        lz = graph.lazy_tables()
        assert lz is not None, "tensor cleaning needs a lazy cached build"
        self.lz = lz
        self.kept_ids = lz["kept_ids"]
        self.doomed_mask = doomed_mask
        self._rid_index = None
        self._adj = None
        self._node_genes: dict = {}
        self._cov_alive: dict = {}
        self._hash_to_idx = None
        self.corrected_order, self._reads_to_correct = self._find_reads_to_correct()
        self._nodes_map = _ReadListMap(self, "nodes")
        self._dirs_map = _ReadListMap(self, "dirs")

    # ---------------------------------------------------------- hole marking

    def _find_reads_to_correct(self):
        lz, mask = self.lz, self.doomed_mask
        if mask is None or not mask.any():
            self._occ_hit = None
            return [], set()
        hit = mask[lz["inv"]]
        self._occ_hit = hit
        if not hit.any():
            return [], set()
        read_hit = np.logical_or.reduceat(hit, lz["offs"][:-1])
        order = [self.kept_ids[i] for i in np.flatnonzero(read_hit).tolist()]
        return order, set(order)

    def _index_of(self, rid) -> int:
        if self._rid_index is None:
            self._rid_index = {r: i for i, r in enumerate(self.kept_ids)}
        return self._rid_index[rid]

    def _build_read_lists(self, rid):
        i = self._index_of(rid)
        e = self.lz["entries"][i]
        nodes = e.nodes_list()[:]
        dirs = e.dirs_list()[:]
        if self._occ_hit is not None:
            o = int(self.lz["offs"][i])
            for j in np.flatnonzero(self._occ_hit[o : o + len(nodes)]).tolist():
                nodes[j] = None
                dirs[j] = None
        self._nodes_map._store(rid, nodes)
        self._dirs_map._store(rid, dirs)
        return nodes, dirs

    # -------------------------------------------------- graph-call surface

    def get_readNodes(self):
        return self._nodes_map

    def get_readNodeDirections(self):
        return self._dirs_map

    def get_reads_to_correct(self):
        return self._reads_to_correct

    def get_reads(self):
        return self.graph.get_reads()

    def get_gene_positions(self):
        return self.graph.get_gene_positions()

    def get_kmerSize(self):
        return self.graph.get_kmerSize()

    def _uh_index(self, h) -> int:
        """Unique-node index of a node hash (dict built once per view; the
        correction loop makes thousands of point lookups, and scalar
        np.searchsorted costs ~30us each on this host)."""
        m = self._hash_to_idx
        if m is None:
            m = dict(
                zip(self.lz["uh"].tolist(), range(len(self.lz["uh"])))
            )
            self._hash_to_idx = m
        return m[h]

    def get_node_by_hash(self, h):
        cov = self._cov_alive.get(h)
        if cov is None:
            cov = int(self.lz["counts"][self._uh_index(h)])
            self._cov_alive[h] = cov
        return _CovNode(cov)

    # adjacency over surviving nodes, per (node_hash, direction), edge lists
    # in global first-occurrence order (= object-graph append order)
    def _adjacency(self):
        if self._adj is None:
            uek, _cov, e_first, src_hs, tgt_hs, src_ds, tgt_ds, src_is, tgt_is = (
                self.graph._edge_table()
            )
            adj: dict = {}
            if uek.size:
                order = np.argsort(e_first, kind="stable")
                if self.doomed_mask is not None:
                    alive = ~(self.doomed_mask[src_is] | self.doomed_mask[tgt_is])
                    order = order[alive[order]]
                sh = src_hs[order].tolist()
                th = tgt_hs[order].tolist()
                sd = src_ds[order].tolist()
                td = tgt_ds[order].tolist()
                for a, b, da, db in zip(sh, th, sd, td):
                    adj.setdefault((a, da), []).append((b, db))
            self._adj = adj
        return self._adj

    def new_find_paths_between_nodes(self, start_hash, end_hash, distance, direction):
        """Bounded DFS (construct_graph.py:2292-2342) over the table-backed
        adjacency; same stack discipline as GeneMerGraph's implementation."""
        adj = self._adjacency()
        results = []
        stack = [(start_hash, direction, [(start_hash, direction)], {start_hash})]
        while stack:
            h, d, path, seen = stack.pop()
            if end_hash is not None:
                if h == end_hash and len(path) <= distance:
                    results.append(path)
                    continue
            else:
                if len(path) - 1 == distance:
                    results.append(path)
                    continue
            if len(path) - 1 > distance:
                continue
            for nxt, nd in adj.get((h, d), ()):
                if nxt in seen:
                    continue
                stack.append((nxt, nd, path + [(nxt, nd)], seen | {nxt}))
        return results

    # ------------------------------------------------- annotation rebuild

    def _genes_of_node(self, h):
        genes = self._node_genes.get(h)
        if genes is None:
            from amira_tpu.vocab import reverse_tokens

            lz = self.lz
            self.graph._first_occurrence()
            j = self._uh_index(h)
            e = lz["entries"][int(lz["f_read"][j])]
            wi = int(lz["f_w"][j])
            k = self.graph.get_kmerSize()
            wtok = e.tok[wi : wi + k]
            if int(e.wd[wi]) != 1:
                wtok = reverse_tokens(wtok)
            decode = self.graph.vocab.decode_gene
            genes = [decode(t) for t in wtok]
            self._node_genes[h] = genes
        return genes

    def get_annotation_for_read(self, node_list, node_directions, read_id):
        """Stranded gene list from a node path (construct_graph.py:1331-1373;
        mirrors GeneMerGraph.get_annotation_for_read on table-backed nodes)."""
        assert len(node_list) == len(node_directions), (
            f"The number of nodes and node directions for read {read_id} differ"
        )
        if not node_directions:
            node_directions = self._dirs_map[read_id]

        def fw(h):
            return self._genes_of_node(h)

        def bw(h):
            genes = self._genes_of_node(h)
            return [("-" if g[0] == "+" else "+") + g[1:] for g in reversed(genes)]

        if len(node_list) == 1:
            d = node_directions[0]
            if d == 1:
                return fw(node_list[0])
            if d == -1:
                return bw(node_list[0])
            raise ValueError(f"Gene-mer direction cannot be {d}")
        annotations: list = []
        for i, h in enumerate(node_list):
            d = node_directions[i]
            if i == 0:
                genes = fw(h) if d == 1 else bw(h)
                annotations += genes[:-1]
            if d:
                genes = fw(h) if d == 1 else bw(h)
                annotations.append(genes[-1])
        assert None not in annotations
        return annotations


# ------------------------------------------------------------------ phases


def _correct_reads_fast(view, fastq_data):
    """Same output as amira_tpu/correct.py:correct_reads run over the view,
    but the all-reads Python loop collapses to two dict comprehensions;
    only reads that actually have holes go through correct_single_read
    (in kept-read order, like the object loop)."""
    reads = view.get_reads()
    gpos = view.get_gene_positions()
    has_pos = bool(gpos)
    corrected_genes = {rid: reads[rid] for rid in view.kept_ids}
    corrected_positions = (
        {rid: gpos[rid] for rid in view.kept_ids} if has_pos else {}
    )
    read_nodes = view.get_readNodes()
    for rid in view.corrected_order:
        genes = correct_single_read(view, rid, read_nodes, fastq_data)
        if len(genes) > 0:
            corrected_genes[rid] = genes
            if has_pos:
                corrected_positions[rid] = gpos[rid]
        else:
            del corrected_genes[rid]
            if has_pos:
                del corrected_positions[rid]
    return corrected_genes, corrected_positions


def filter_and_correct(graph, min_node_coverage, fastq_data):
    """filter_graph(min_node_coverage, 1) + correct_reads on the tables
    (construct_graph.py:496-540 + 1123-1134). Returns (genes, positions)
    dicts exactly as the object path would."""
    lz = graph.lazy_tables()
    doomed_mask = lz["counts"] < min_node_coverage
    view = _TensorView(graph, doomed_mask)
    return _correct_reads_fast(view, fastq_data)


def tip_trim_and_correct(graph, min_length, fastq_data, sample_genesOfInterest=()):
    """remove_short_linear_paths(min_length) + correct_reads on the tables
    (construct_graph.py:679-720). Tip end-state is order-independent (static
    guards, union of qualifying paths), so a table scan in first-occurrence
    node order reproduces the object walk exactly."""
    lz = graph.lazy_tables()
    graph._first_occurrence()
    uh, counts, first_idx = lz["uh"], lz["counts"], lz["first_idx"]
    n = len(uh)
    if n == 0:
        view = _TensorView(graph, None)
        return _correct_reads_fast(view, fastq_data)
    uek, _ecov, e_first, src_hs, tgt_hs, src_ds, tgt_ds, src_idx, tgt_idx = (
        graph._edge_table()
    )
    fwd: list = [[] for _ in range(n)]
    bwd: list = [[] for _ in range(n)]
    order = np.argsort(e_first, kind="stable")
    for gi in order.tolist():
        si, ti = int(src_idx[gi]), int(tgt_idx[gi])
        rec = (ti, int(tgt_ds[gi]))
        (fwd if int(src_ds[gi]) == 1 else bwd)[si].append(rec)
    degree = np.fromiter(
        (len(fwd[i]) + len(bwd[i]) for i in range(n)), np.int64, n
    )

    # connected components over the undirected edge set
    comp = _components(n, src_idx, tgt_idx)

    mean_cov = float(np.mean(counts))
    covs = counts

    def step_fwd(i):
        # construct_graph.py:722-741 — exactly one forward edge required
        if len(fwd[i]) == 1:
            ti, td = fwd[i][0]
            if degree[ti] <= 2 and ti != i:
                return True, ti, td
            return False, ti, td
        return False, None, None

    def step_bwd(i):
        # construct_graph.py:781-802 — FIRST backward edge whenever any exist
        if bwd[i]:
            ti, td = bwd[i][0]
            if degree[ti] <= 2 and ti != i:
                return True, ti, td
            return False, ti, td
        return False, None, None

    def linear_path(i):
        # get_linear_path_for_node (construct_graph.py:849-861) with the
        # first-occurrence observed direction = +1
        path = [i]
        extend, nxt, nd = step_fwd(i)
        while extend:
            if path[0] == nxt:
                break
            path.append(nxt)
            extend, nxt, nd = (step_fwd if nd == 1 else step_bwd)(nxt)
        back = []
        extend, nxt, nd = step_bwd(i)
        while extend:
            if nxt == i:
                break  # cycle guard: the walk returned to the start node
            back.insert(0, nxt)
            extend, nxt, nd = (step_bwd if nd == -1 else step_fwd)(nxt)
        return back + path

    # AMR nodes by gene membership (guard set; empty in the cleaning loop)
    amr_idx: set = set()
    if sample_genesOfInterest:
        vocab = graph.vocab
        gids = {
            vocab.id_of(g) for g in sample_genesOfInterest if g in vocab
        }
        if gids:
            toks = graph.node_tokens_for(uh.tolist())
            for i, t in enumerate(toks):
                if any(int(a) in gids for a in np.abs(t)):
                    amr_idx.add(i)

    insertion_order = np.argsort(first_idx, kind="stable").tolist()
    paths_to_remove: dict = {}
    for i in insertion_order:
        if degree[i] == 1:
            path = linear_path(i)
            if 0 < len(path) < min_length:
                if all(covs[j] > mean_cov * 1.5 for j in path):
                    continue  # tandem-repeat guard
                paths_to_remove.setdefault(int(comp[i]), []).append(path)

    comp_sizes = np.bincount(comp, minlength=int(comp.max()) + 1 if n else 0)
    removed: set = set()
    for cid, paths in paths_to_remove.items():
        for path in paths:
            if len(set(path)) == int(comp_sizes[cid]):
                continue  # never delete a whole component
            for j in path:
                if j in amr_idx or j in removed:
                    continue
                removed.add(j)

    doomed_mask = None
    if removed:
        doomed_mask = np.zeros(n, dtype=bool)
        doomed_mask[np.fromiter(removed, np.int64, len(removed))] = True
    view = _TensorView(graph, doomed_mask)
    return _correct_reads_fast(view, fastq_data)


def _components(n, src_idx, tgt_idx) -> np.ndarray:
    """Connected-component labels over n nodes from edge index arrays."""
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        if len(src_idx) == 0:
            return np.arange(n, dtype=np.int64)
        data = np.ones(len(src_idx), dtype=np.int8)
        m = coo_matrix((data, (src_idx, tgt_idx)), shape=(n, n))
        _, labels = connected_components(m, directed=False)
        return labels.astype(np.int64)
    except Exception:  # pragma: no cover - scipy is baked in
        parent = np.arange(n, dtype=np.int64)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(src_idx.tolist(), tgt_idx.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        return np.fromiter((find(i) for i in range(n)), np.int64, n)
