"""Multi-copy AMR path clustering: assign each read to a specific genomic
copy of each AMR gene by its graph context.

Reference semantics: amira/construct_graph.py:2360-2959 and
amira/path_finding_utils.py. The reference's generalized suffix trees are
replaced by posting-list sequence indexes (amira_tpu/stree.py) that answer
the same contains/suffix queries; all answers are identical.
"""

from __future__ import annotations

from amira_tpu.stree import SequenceIndex, find_sublist_indices, is_sublist


# ------------------------------------------------------------------ anchors


def get_AMR_anchors(graph, AMRNodes):
    """AMR nodes that border non-AMR context (path endpoints), including the
    singleton/terminal-occurrence heuristics (construct_graph.py:2629-2691).
    """
    AMRNodes = set(AMRNodes)
    nodeAnchors = set()
    terminals: dict = {}
    read_nodes_map = graph.get_readNodes()
    for nodeHash in AMRNodes:
        terminals[nodeHash] = []
        node = graph.get_node_by_hash(nodeHash)
        is_anchor = False
        singletons = []
        forward_neighbors = graph.get_forward_neighbors(node)
        # NOTE: the reference derives both fw_non_self and bw_non_self from
        # the *forward* neighbors (construct_graph.py:2644-2646); we mirror
        # that so anchor sets match.
        fw_non_self = [n for n in forward_neighbors if n.hash != nodeHash]
        bw_non_self = [n for n in forward_neighbors if n.hash != nodeHash]
        if len(fw_non_self) == 0 or len(bw_non_self) == 0:
            nodeAnchors.add(nodeHash)
        for r in node.reads:
            read_nodes = read_nodes_map[r]
            if len(read_nodes) == 1 and read_nodes[0] == nodeHash:
                singletons.append(True)
                terminals[nodeHash].append(True)
                break
            singletons.append(False)
            AMR_indices = [1 if n in AMRNodes else 0 for n in read_nodes]
            for index in [i for i, n in enumerate(read_nodes) if n == nodeHash]:
                if index != 0 and index != len(read_nodes) - 1:
                    if AMR_indices[index - 1] == 0 or AMR_indices[index + 1] == 0:
                        is_anchor = True
                        break
                    terminals[nodeHash].append(False)
                else:
                    terminals[nodeHash].append(True)
            if is_anchor:
                nodeAnchors.add(nodeHash)
                break
        if all(s is True for s in singletons) or all(
            t is True for t in terminals[nodeHash]
        ):
            fwd_amr = [
                n for n in graph.get_forward_neighbors(node) if n.hash in AMRNodes
            ]
            bwd_amr = [
                n for n in graph.get_backward_neighbors(node) if n.hash in AMRNodes
            ]
            if len(bwd_amr) == 0 or len(fwd_amr) == 0:
                nodeAnchors.add(nodeHash)
    for nodeHash in terminals:
        if len(terminals[nodeHash]) > 0:
            if terminals[nodeHash].count(True) / len(terminals[nodeHash]) > 0.3:
                nodeAnchors.add(nodeHash)
    return nodeAnchors


# ------------------------------------------------------------ context paths


def construct_node_index(read_nodes: dict) -> SequenceIndex:
    """Index of per-read node-hash sequences plus their reverses (for reads
    visiting more than one distinct node), mirroring
    path_finding_utils.py:79-85."""
    seqs = dict(read_nodes)
    for r in list(read_nodes.keys()):
        if len(set(read_nodes[r])) != 1:
            seqs[r + "_reverse"] = list(reversed(read_nodes[r]))
    return SequenceIndex(seqs)


def cluster_adjacent_paths(adjacent_paths, upstream: bool):
    """Cluster context subpaths by prefix (downstream) / suffix (upstream)
    containment; representative = shortest member
    (path_finding_utils.py:11-64)."""
    sorted_paths = sorted([k for k in adjacent_paths], key=len, reverse=True)
    clustered: dict = {}
    for p in sorted_paths:
        list_p = list(p)
        supported = []
        for c in clustered:
            list_c = list(c)
            if upstream:
                match = bool(list_p) and list_p == list_c[-len(list_p):]
            else:
                match = bool(list_p) and list_p == list_c[: len(list_p)]
            if match or not list_p:
                supported.append(c)
        if len(supported) == 0:
            clustered[p] = {p}
        if len(supported) == 1:
            clustered[supported[0]].add(p)
    final = {}
    for c in clustered:
        final[min(list(clustered[c]), key=len)] = {
            "longest": max(list(clustered[c]), key=len),
            "all": list(clustered[c]),
        }
    return final


def get_all_context_options(nodes_on_read, start, end):
    up = tuple(nodes_on_read[:start])
    up_options = {up[i:] for i in range(len(up))}
    down = tuple(nodes_on_read[end + 1 :])
    down_options = {down[:i] for i in range(1, len(down) + 1)}
    up_options.add(())
    down_options.add(())
    return up_options, down_options


def get_canonical_representation(block):
    return sorted([block, list(reversed(block))])[0]


def _get_full_path_contexts(
    positions_of_path, contexts, reads, read_id, block_reads, ctx_memo=None
):
    start, end = positions_of_path[0]
    if ctx_memo is None:
        up_options, down_options = get_all_context_options(reads[read_id], start, end)
    else:
        # the same (read, span) is revisited for every anchor pair whose
        # block lands on it; the option sets are immutable tuples -> memoize
        memo_key = (read_id, start, end)
        cached = ctx_memo.get(memo_key)
        if cached is None:
            cached = get_all_context_options(reads[read_id], start, end)
            ctx_memo[memo_key] = cached
        up_options, down_options = cached
    canonical = get_canonical_representation(block_reads[read_id])
    canonical_tuple = tuple(canonical)
    if canonical == block_reads[read_id]:
        if canonical_tuple not in contexts:
            contexts[canonical_tuple] = {"upstream": set(), "downstream": set()}
        contexts[canonical_tuple]["upstream"].update(up_options)
        contexts[canonical_tuple]["downstream"].update(down_options)
    else:
        # reverse orientation: swap and reverse the context options.
        # The reference overwrites the context sets here instead of
        # accumulating (path_finding_utils.py:153-162), which makes the
        # result depend on which orientation its sha256 hash order happens
        # to canonicalize to (reads processed later erase earlier reads'
        # diverging contexts). The behavior its test corpus pins down
        # (test_path_finding.py:743, diverging terminals -> 2 paths) needs
        # every read's contexts, so we accumulate symmetrically.
        if canonical_tuple not in contexts:
            contexts[canonical_tuple] = {"upstream": set(), "downstream": set()}
        rv_up = {tuple(reversed(list(u))) for u in up_options}
        rv_down = {tuple(reversed(list(d))) for d in down_options}
        contexts[canonical_tuple]["upstream"].update(rv_down)
        contexts[canonical_tuple]["downstream"].update(rv_up)


def get_blocks_from_index(suffix_index: SequenceIndex, a2, nodeAnchors):
    """Anchor-to-anchor blocks from the reversed-suffix index
    (path_finding_utils.py:103-123)."""
    block_reads: dict = {}
    block_duplicates: dict = {}
    for read_id, pos in suffix_index.find_all([a2]):
        path_list = suffix_index.sequences[read_id][pos:]
        assert path_list[0] in nodeAnchors and path_list[-1] in nodeAnchors
        canonical_tuple = tuple(get_canonical_representation(path_list))
        block_duplicates[canonical_tuple] = False
        if "_reverse" not in str(read_id):
            cand = list(reversed(path_list))
            if read_id not in block_reads or len(cand) > len(block_reads[read_id]):
                block_reads[read_id] = cand
    return block_reads, block_duplicates


def generate_contexts(block_reads, block_duplicates, reads, ctx_memo=None):
    contexts: dict = {}
    for read_id in block_reads:
        block = block_reads[read_id]
        positions_of_path = find_sublist_indices(reads[read_id], block)
        assert len(positions_of_path) > 0
        canonical_tuple = tuple(get_canonical_representation(block))
        if len(positions_of_path) > 1:
            block_duplicates[canonical_tuple] = True
        if len(positions_of_path) == 1:
            _get_full_path_contexts(
                positions_of_path, contexts, reads, read_id, block_reads, ctx_memo
            )
    return contexts


def generate_full_paths(contexts, block_duplicates, full_blocks, node_index, threshold):
    for c in contexts:
        if block_duplicates[c] is False:
            up_clusters = cluster_adjacent_paths(contexts[c]["upstream"], upstream=True)
            down_clusters = cluster_adjacent_paths(
                contexts[c]["downstream"], upstream=False
            )
            full_paths = [u + c + d for u in up_clusters for d in down_clusters]
            for f in full_paths:
                reads_with_full_path = {
                    str(sid).replace("_reverse", "")
                    for sid in node_index.find_ids(list(f))
                }
                if len(reads_with_full_path) > 0:
                    full_blocks[tuple(f)] = reads_with_full_path


def process_anchors(
    suffix_index, nodeAnchors, a1, full_blocks, reads, node_index, threshold,
    ctx_memo=None,
):
    for a2 in nodeAnchors:
        if a1 != a2:
            block_reads, block_duplicates = get_blocks_from_index(
                suffix_index, a2, nodeAnchors
            )
            contexts = generate_contexts(block_reads, block_duplicates, reads, ctx_memo)
            generate_full_paths(
                contexts, block_duplicates, full_blocks, node_index, threshold
            )


def filter_blocks(full_blocks):
    """Drop node-blocks contained (fw or rv) in an already-kept longer block
    (path_finding_utils.py:250-259)."""
    filtered: dict = {}
    for p in sorted(list(full_blocks.keys()), key=len, reverse=True):
        p_list = list(p)
        rv_p_list = list(reversed(p_list))
        if not any(
            is_sublist(list(f), p_list) or is_sublist(list(f), rv_p_list)
            for f in filtered
        ):
            filtered[p] = full_blocks[p]
    return filtered


# ------------------------------------------------------ gene-window support


def get_all_sublists(gene_index: SequenceIndex, lst, threshold, geneOfInterest):
    """All gene windows of the unitig containing every copy of the gene, with
    read support >= threshold (construct_graph.py:2711-2723 +
    path_finding_utils.py:296-310). One shared index replaces the
    per-worker suffix-tree rebuilds."""
    sublists = {}
    fw, bw = f"+{geneOfInterest}", f"-{geneOfInterest}"
    copy_idx = [i for i, g in enumerate(lst) if g == fw or g == bw]
    if not copy_idx:
        # blocks are anchored on nodes containing the gene, so a block gene
        # list without it should be unreachable; log loudly rather than
        # silently dropping the block if that assumption ever breaks
        import sys

        sys.stderr.write(
            f"\namira-tpu: WARNING: block without {geneOfInterest} in "
            "sublist support search; block skipped.\n"
        )
        return sublists
    # a window contains every copy of the gene iff it spans
    # [first_copy, last_copy] — enumerate exactly those windows instead of
    # all O(L^2) windows (identical key set: windows are dict keys, so
    # duplicate contents collapse either way)
    first, last = copy_idx[0], copy_idx[-1]
    for start in range(first + 1):
        for end in range(last, len(lst)):
            comb = tuple(lst[start : end + 1])
            reads_with_path = {
                str(sid).replace("_reverse", "")
                for sid in gene_index.find_ids(list(comb))
            }
            if len(reads_with_path) >= threshold:
                sublists[comb] = len(reads_with_path)
    return sublists


# ----------------------------------------------------------- full path set


def get_full_paths(
    graph, node_index, nodeAnchors, threshold, gene_call_subset, geneOfInterest
):
    """Anchor-pair context discovery -> clustered full paths -> the
    differentiating gene window per block (construct_graph.py:2725-2782)."""
    full_blocks: dict = {}
    ctx_memo: dict = {}
    for a1 in nodeAnchors:
        suffixes = node_index.suffixes_from(a1)
        reversed_suffixes = {r: list(reversed(s)) for r, s in suffixes.items()}
        # the sub-index is only ever queried by single anchor symbols
        sub_index = SequenceIndex(reversed_suffixes, symbols=nodeAnchors)
        process_anchors(
            sub_index, nodeAnchors, a1, full_blocks, node_index.sequences,
            node_index, threshold, ctx_memo,
        )
    gene_index = SequenceIndex(gene_call_subset)
    gene_blocks: dict = {}
    unitig_gene_cache: dict = {}

    def genes_of(f):
        if f not in unitig_gene_cache:
            unitig_gene_cache[f] = graph.get_genes_in_unitig(list(f))
        return unitig_gene_cache[f]

    for f in full_blocks:
        try:
            genes_in_path = genes_of(f)
        except (ValueError, AssertionError, KeyError):
            continue
        all_sublists = get_all_sublists(
            gene_index, genes_in_path, threshold, geneOfInterest
        )
        if len(all_sublists) > 0:
            gene_blocks[f] = all_sublists
    filtered_blocks = filter_blocks({f: full_blocks[f] for f in gene_blocks})
    final_paths: dict = {}
    final_path_coverages: dict = {}
    seen_nodes: set = set()
    for f1 in filtered_blocks:
        seen_nodes.update(f1)
        if f1 not in gene_blocks:
            continue
        differentiating = set()
        for o1 in gene_blocks[f1]:
            if not any(
                is_sublist(genes_of(f2), list(o1))
                or is_sublist(genes_of(f2), graph.reverse_list_of_genes(list(o1)))
                for f2 in filtered_blocks
                if f1 != f2
            ):
                differentiating.add(o1)
        if len(differentiating) > 0:
            selected = sorted(
                list(differentiating),
                key=lambda x: (
                    x.count(f"+{geneOfInterest}") + x.count(f"-{geneOfInterest}"),
                    gene_blocks[f1][x],
                    len(x),
                ),
                reverse=True,
            )[0]
            final_paths[selected] = gene_blocks[f1][selected]
            final_path_coverages[selected] = [
                graph.get_node_by_hash(n).coverage for n in list(f1)
            ]
    return final_paths, seen_nodes, final_path_coverages


def get_singleton_paths(graph, all_seen_nodes, nodeAnchors, final_paths, final_path_coverages):
    for a in nodeAnchors:
        if a not in all_seen_nodes:
            genes = tuple(graph.get_genes_in_unitig([a]))
            node = graph.get_node_by_hash(a)
            final_paths[genes] = len(set(node.reads))
            final_path_coverages[genes] = [node.coverage]


def get_paths_for_gene(
    graph, node_index, gene_call_subset, nodeHashesOfInterest, threshold, geneOfInterest
):
    nodeAnchors = get_AMR_anchors(graph, nodeHashesOfInterest)
    final_paths, seen_nodes, final_path_coverages = get_full_paths(
        graph, node_index, nodeAnchors, threshold, gene_call_subset, geneOfInterest
    )
    get_singleton_paths(graph, seen_nodes, nodeAnchors, final_paths, final_path_coverages)
    return final_paths, final_path_coverages


# ------------------------------------------------------------ subpath split


def split_into_subpaths(
    graph, geneOfInterest, pathsOfInterest, path_coverages, path_reads,
    mean_node_coverage=None,
):
    """Name alleles <gene>_<n> per path copy and collect per-read allele
    sequence spans (construct_graph.py:2360-2455)."""
    allele_count = 1
    gene_clusters: dict = {}
    if mean_node_coverage is None:
        mean_node_coverage = graph.get_mean_node_coverage()
    read_tracking: dict = {}
    # every differentiating path contains the gene of interest, so only
    # reads carrying the gene can match it (fw or rc) — prefilter once
    candidate_reads = [
        read_id
        for read_id, genes in graph.get_reads().items()
        if any(g[1:] == geneOfInterest for g in genes)
    ]
    for path in pathsOfInterest:
        modified_path = list(path)
        genes_in_path = list(path)
        reverse_genes_in_path = graph.reverse_list_of_genes(genes_in_path)
        fw_indices: dict = {}
        rv_indices: dict = {}
        for g in range(len(genes_in_path)):
            if genes_in_path[g][1:] == geneOfInterest:
                name = f"{geneOfInterest}_{allele_count}"
                fw_indices[g] = name
                rv_indices[len(genes_in_path) - g - 1] = name
                gene_clusters[name] = []
                read_tracking[name] = set()
                modified_path[g] = f"{genes_in_path[g][0]}{name}"
                allele_count += 1
        modified_path = tuple(modified_path)
        for read_id in candidate_reads:
            genes_on_read = graph.get_reads()[read_id]
            if is_sublist(genes_on_read, genes_in_path):
                positions_of_path = find_sublist_indices(genes_on_read, genes_in_path)
                indices_in_path = fw_indices
            elif is_sublist(genes_on_read, reverse_genes_in_path):
                positions_of_path = find_sublist_indices(
                    genes_on_read, reverse_genes_in_path
                )
                indices_in_path = rv_indices
            else:
                continue
            if len(positions_of_path) == 1:
                if modified_path not in path_reads:
                    path_reads[modified_path] = set()
                path_reads[modified_path].add(read_id)
                for path_start, _path_end in positions_of_path:
                    for gene_index in indices_in_path:
                        assert (
                            graph.get_reads()[read_id][path_start + gene_index][1:]
                            == geneOfInterest
                        )
                        seq_start, seq_end = graph.get_gene_positions()[read_id][
                            path_start + gene_index
                        ]
                        tag = f"{read_id}_{seq_start}_{seq_end}"
                        gene_clusters[indices_in_path[gene_index]].append(tag)
                        read_tracking[indices_in_path[gene_index]].add(tag)
    sorted_alleles = sorted(
        [a for a in read_tracking], key=lambda x: len(read_tracking[x]), reverse=True
    )
    to_delete = set()
    for i in range(len(sorted_alleles)):
        a1 = sorted_alleles[i]
        if a1 in to_delete:
            continue
        for a2 in sorted_alleles[i + 1 :]:
            if a1 == a2:
                continue
            if len(read_tracking[a1] & read_tracking[a2]) > 0:
                to_delete.add(a2)
    for d in to_delete:
        del gene_clusters[d]
    return gene_clusters, path_reads


# ------------------------------------------------------- component assembly


def assign_final_alleles_to_components(
    graph, finalAllelesOfInterest, clustered_reads, allele_counts, geneOfInterest
):
    """(construct_graph.py:2784-2807)"""
    for allele in finalAllelesOfInterest:
        component = None
        for read_id in finalAllelesOfInterest[allele]:
            base_read = "_".join(read_id.split("_")[:-2])
            for node_hash in graph.get_readNodes()[base_read]:
                if node_hash is not None and node_hash in graph.get_nodes():
                    component = graph.get_node_by_hash(node_hash).component
                    break
            break
        gene_name = "_".join(allele.split("_")[:-1])
        if gene_name not in allele_counts:
            allele_counts[gene_name] = 1
        if component not in clustered_reads:
            clustered_reads[component] = {}
        if geneOfInterest not in clustered_reads[component]:
            clustered_reads[component][geneOfInterest] = {}
        clustered_reads[component][geneOfInterest][
            f"{gene_name}_{allele_counts[gene_name]}"
        ] = finalAllelesOfInterest[allele]
        allele_counts[gene_name] += 1


def collect_component_missed_genes(
    graph, component_nodeHashesOfInterest, clustered_reads, allele_counts,
    geneOfInterest, path_reads,
):
    """Sweep up AMR genes that got no path cluster in a component
    (construct_graph.py:2831-2878)."""
    for component in component_nodeHashesOfInterest:
        nodeHashesOfInterest = component_nodeHashesOfInterest[component]
        if component not in clustered_reads:
            clustered_reads[component] = {}
        if geneOfInterest not in clustered_reads[component]:
            clustered_reads[component][geneOfInterest] = {}
        if len(clustered_reads[component][geneOfInterest]) == 0:
            if geneOfInterest not in allele_counts:
                allele_counts[geneOfInterest] = 1
            allele_name = f"{geneOfInterest}_{allele_counts[geneOfInterest]}"
            allele_name_tuple = tuple([f"+{allele_name}"])
            clustered_reads[component][geneOfInterest][allele_name] = []
            reads = graph.collect_reads_in_path(nodeHashesOfInterest)
            for read_id in reads:
                genes = graph.get_reads()[read_id]
                indices = [
                    i for i, gene in enumerate(genes) if gene[1:] == geneOfInterest
                ]
                for i in indices:
                    gene_start, gene_end = graph.get_gene_positions()[read_id][i]
                    clustered_reads[component][geneOfInterest][allele_name].append(
                        f"{read_id}_{gene_start}_{gene_end}"
                    )
                if allele_name_tuple not in path_reads:
                    path_reads[allele_name_tuple] = set()
                path_reads[allele_name_tuple].add(read_id)
            allele_counts[geneOfInterest] += 1


def assign_reads_to_genes(
    graph, listOfGenes, cores=1, allele_counts=None, mean_node_coverage=None,
    path_threshold=5,
):
    """Per-AMR-gene read->allele clustering (construct_graph.py:2880-2939)."""
    if allele_counts is None:
        allele_counts = {}
    clustered_reads: dict = {}
    path_reads: dict = {}
    if mean_node_coverage is None:
        mean_node_coverage = graph.get_mean_node_coverage()
    for geneOfInterest in sorted(listOfGenes):
        nodesOfInterest = graph.get_nodes_containing(geneOfInterest)
        nodeHashesOfInterest = [n.hash for n in nodesOfInterest]
        if not nodeHashesOfInterest:
            continue
        reads_with_gene = graph.collect_reads_in_path(nodeHashesOfInterest)
        node_index = construct_node_index(
            {r: graph.get_readNodes()[r] for r in reads_with_gene}
        )
        gene_call_subset = {r: graph.get_reads()[r] for r in reads_with_gene}
        rc_reads = {
            r + "_reverse": graph.reverse_list_of_genes(gene_call_subset[r])
            for r in gene_call_subset
        }
        gene_call_subset = {**gene_call_subset, **rc_reads}
        pathsOfInterest, pathCoverages = get_paths_for_gene(
            graph,
            node_index,
            gene_call_subset,
            nodeHashesOfInterest,
            mean_node_coverage / 20,
            geneOfInterest,
        )
        finalAllelesOfInterest, path_reads = split_into_subpaths(
            graph, geneOfInterest, pathsOfInterest, pathCoverages, path_reads,
            mean_node_coverage,
        )
        assign_final_alleles_to_components(
            graph, finalAllelesOfInterest, clustered_reads, allele_counts,
            geneOfInterest,
        )
        component_nodeHashesOfInterest: dict = {}
        for n in nodeHashesOfInterest:
            comp = graph.get_node_by_hash(n).component
            component_nodeHashesOfInterest.setdefault(comp, set()).add(n)
        collect_component_missed_genes(
            graph, component_nodeHashesOfInterest, clustered_reads, allele_counts,
            geneOfInterest, path_reads,
        )
    return clustered_reads, path_reads
