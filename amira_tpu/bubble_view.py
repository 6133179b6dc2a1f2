"""Table-backed graph surface for bubble popping.

`bubbles.correct_low_coverage_paths` consumes a small, well-defined slice of
the GeneMerGraph object API (adjacency walks, per-node coverage/read lists,
per-read node/position rows, unitig gene stitching, component ids). On a
lazy cached build all of it is answerable from the flat aggregation tables
(amira_tpu/graph.py:_build_cached) without materializing the Node/Edge
object graph — this module provides that surface as `BubbleView`.

Costs: O(nodes + edges) light adjacency records per sweep plus lazy
per-node read posting lists and lazy per-read rows — nothing proportional
to total occurrences in Python-object land (the _materialize() path the
object graph takes costs O(occurrences) every cleaning iteration).

Parity contract (pinned by tests/test_bubble_view.py): identical corrected
reads, positions and path coverages as running bubbles on the materialized
object graph, because every list the DFS and the splice logic touch is
constructed in the same order the object build would construct it
(first-occurrence node order, e_first edge-append order, read-index-sorted
node read lists). Reference semantics: amira/construct_graph.py:1482-2265.
"""

from __future__ import annotations

import numpy as np

from amira_tpu.vocab import reverse_tokens


class _LNode:
    __slots__ = ("hash", "coverage", "component", "fwd_edges", "bwd_edges", "_idx", "_view")

    def __init__(self, h, coverage, idx, view):
        self.hash = h
        self.coverage = coverage
        self.component = 0
        self.fwd_edges = []
        self.bwd_edges = []
        self._idx = idx
        self._view = view

    @property
    def reads(self):
        return self._view._reads_of_node(self._idx)


class _LEdge:
    __slots__ = ("src", "tgt", "src_dir", "tgt_dir")

    def __init__(self, src, tgt, src_dir, tgt_dir):
        self.src = src
        self.tgt = tgt
        self.src_dir = src_dir
        self.tgt_dir = tgt_dir


class _LazyRowMap:
    """Dict-like {read_id: row} that builds rows on first access."""

    def __init__(self, view, which):
        self._view = view
        self._which = which

    def __getitem__(self, rid):
        return self._view._read_row(rid, self._which)

    def __contains__(self, rid):
        return rid in self._view._rid_index

    def __iter__(self):
        return iter(self._view._kept_ids)

    def __len__(self):
        return len(self._view._kept_ids)


class BubbleView:
    """GeneMerGraph stand-in over the lazy tables for bubble popping."""

    def __init__(self, graph):
        self.graph = graph
        # the run-long build cache also carries node sketch sets for the
        # bubble sweeps (bubbles.get_minhashes_for_paths)
        self._cache = getattr(graph, "_cache", None)
        lz = graph.lazy_tables()
        assert lz is not None, "BubbleView needs a lazy cached build"
        self.lz = lz
        self._kept_ids = lz["kept_ids"]
        self._rid_index = {r: i for i, r in enumerate(self._kept_ids)}
        self._node_rows = {}  # rid -> nodes row cache
        self._pos_rows = {}  # rid -> positions row cache
        self._node_genes: dict = {}
        self._pair_bounds = None
        graph._first_occurrence()

        # ---- nodes in first-occurrence (insertion) order, adjacency from
        # the unique-edge table in e_first (append) order — both identical
        # to what _materialize() would have produced
        uh = lz["uh"]
        counts = lz["counts"]
        first_idx = lz["first_idx"]
        n = len(uh)
        uh_l = uh.tolist()
        covs_l = counts.tolist()
        self._uh_index = {h: i for i, h in enumerate(uh_l)}
        nodes_by_run = [
            _LNode(uh_l[gi], covs_l[gi], gi, self) for gi in range(n)
        ]
        self._nodes_by_run = nodes_by_run
        self._insertion_order = np.argsort(first_idx, kind="stable").tolist()
        self._nodes_d: dict = {}
        for gi in self._insertion_order:
            node = nodes_by_run[gi]
            self._nodes_d[node.hash] = node

        uek, _ecov, e_first, src_hs, tgt_hs, src_ds, tgt_ds, _si, _ti = (
            graph._edge_table()
        )
        self._edges_d: dict = {}
        if uek.size:
            uek_l = uek.tolist()
            src_hl, tgt_hl = src_hs.tolist(), tgt_hs.tolist()
            src_dl, tgt_dl = src_ds.tolist(), tgt_ds.tolist()
            for gi in np.argsort(e_first, kind="stable").tolist():
                key = uek_l[gi]
                src_h, src_d = src_hl[gi], src_dl[gi]
                edge = _LEdge(src_h, tgt_hl[gi], src_d, tgt_dl[gi])
                self._edges_d[key] = edge
                src_node = self._nodes_d[src_h]
                lst = src_node.fwd_edges if src_d == 1 else src_node.bwd_edges
                if key not in lst:
                    lst.append(key)

        # ---- component ids: BFS numbering in insertion order, exactly
        # like GeneMerGraph.assign_component_ids
        visited = set()
        cid = 0
        for h, node in self._nodes_d.items():
            if h in visited:
                continue
            cid += 1
            stack = [h]
            visited.add(h)
            while stack:
                cur_node = self._nodes_d[stack.pop()]
                cur_node.component = cid
                for key in cur_node.fwd_edges + cur_node.bwd_edges:
                    nb = self._edges_d[key].tgt
                    if nb not in visited:
                        visited.add(nb)
                        stack.append(nb)

    # ------------------------------------------------------------ accessors

    def get_kmerSize(self):
        return self.graph.get_kmerSize()

    def get_reads(self):
        return self.graph.get_reads()

    def get_gene_positions(self):
        return self.graph.get_gene_positions()

    def get_nodes(self):
        return self._nodes_d

    def get_edges(self):
        return self._edges_d

    def all_nodes(self):
        return iter(list(self._nodes_d.values()))

    def get_node_by_hash(self, h):
        return self._nodes_d[h]

    def components(self):
        return sorted({n.component for n in self._nodes_d.values()})

    def get_readNodes(self):
        return _LazyRowMap(self, "nodes")

    def get_readNodePositions(self):
        return _LazyRowMap(self, "positions")

    def reverse_list_of_genes(self, genes):
        return self.graph.reverse_list_of_genes(genes)

    # ------------------------------------------------------- lazy read rows

    def _read_row(self, rid, which):
        cache = self._node_rows if which == "nodes" else self._pos_rows
        row = cache.get(rid)
        if row is not None:
            return row
        i = self._rid_index[rid]
        e = self.lz["entries"][i]
        if which == "nodes":
            row = e.nodes_list()[:]
        else:
            k = self.graph.get_kmerSize()
            pos = self.graph.get_gene_positions()[rid]
            if e.pos_src is not pos:
                e.pos_tpl = [
                    (pos[j][0], pos[j + k - 1][1])
                    for j in range(len(e.nodes_list()))
                ]
                e.pos_src = pos
            row = e.pos_tpl[:]
        cache[rid] = row
        return row

    # -------------------------------------------------- node read postings

    def _reads_of_node(self, gi):
        if self._pair_bounds is None:
            lz = self.lz
            inv, wlens = lz["inv"], lz["wlens"]
            n_entries = len(lz["entries"])
            occ_read = np.repeat(np.arange(n_entries, dtype=np.int64), wlens)
            pair_key = (inv.astype(np.uint64) << np.uint64(32)) | occ_read.astype(
                np.uint64
            )
            upairs = np.unique(pair_key)
            prun = (upairs >> np.uint64(32)).astype(np.int64)
            self._pread = (upairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
            self._pair_bounds = np.searchsorted(
                prun, np.arange(len(lz["uh"]) + 1)
            )
            self._kept_arr = np.array(self._kept_ids, dtype=object)
        lo, hi = self._pair_bounds[gi], self._pair_bounds[gi + 1]
        return self._kept_arr[self._pread[lo:hi]].tolist()

    # ------------------------------------------------------- gene stitching

    def _genes_of_node_fw(self, h):
        genes = self._node_genes.get(h)
        if genes is None:
            lz = self.lz
            j = self._uh_index[h]
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

    def _genes_of_node_bw(self, h):
        return self.reverse_list_of_genes(self._genes_of_node_fw(h))

    def _first_edge_between(self, a_hash, b_hash):
        """First a->b edge in fwd+bwd append order; asserts both directions
        exist (GeneMerGraph.get_edge_hashes_between_nodes semantics)."""
        a = self._nodes_d[a_hash]
        b = self._nodes_d[b_hash]
        ab = [
            k
            for k in a.fwd_edges + a.bwd_edges
            if self._edges_d[k].tgt == b_hash
        ]
        ba = [
            k
            for k in b.fwd_edges + b.bwd_edges
            if self._edges_d[k].tgt == a_hash
        ]
        assert ab and ba, "There are edges missing from the source and target nodes"
        return self._edges_d[ab[0]]

    def get_direction_between_two_nodes(self, src_hash, tgt_hash):
        return self._first_edge_between(src_hash, tgt_hash).tgt_dir * -1

    def get_genes_in_unitig(self, node_path):
        """Stitch stranded gene strings along a node path
        (GeneMerGraph.get_genes_in_unitig over the tables)."""
        if len(node_path) == 1:
            return self._genes_of_node_fw(node_path[0])
        k = self.graph.get_kmerSize()
        annotations: list[str] = []
        errored = False
        for i in range(len(node_path) - 1):
            edge = self._first_edge_between(node_path[i], node_path[i + 1])
            if i == 0:
                annotations += (
                    self._genes_of_node_fw(node_path[0])
                    if edge.src_dir == 1
                    else self._genes_of_node_bw(node_path[0])
                )
            fw = self._genes_of_node_fw(node_path[i + 1])
            bw = self._genes_of_node_bw(node_path[i + 1])
            if fw[:-1] == annotations[-(k - 1):]:
                annotations.append(fw[-1])
            elif bw[:-1] == annotations[-(k - 1):]:
                annotations.append(bw[-1])
            else:
                errored = True
                break
        if not errored:
            return annotations
        annotations = []
        for i in range(len(node_path) - 1):
            edge = self._first_edge_between(node_path[i], node_path[i + 1])
            if i == 0:
                annotations += (
                    self._genes_of_node_fw(node_path[0])
                    if edge.src_dir == 1
                    else self._genes_of_node_bw(node_path[0])
                )
            fw = self._genes_of_node_fw(node_path[i + 1])
            bw = self._genes_of_node_bw(node_path[i + 1])
            if fw[1:] == annotations[: k - 1]:
                annotations.insert(0, fw[0])
            elif bw[1:] == annotations[: k - 1]:
                annotations.insert(0, bw[0])
            else:
                raise ValueError("Gene sequences do not match in alternative path.")
        return annotations
