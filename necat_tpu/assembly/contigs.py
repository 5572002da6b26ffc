"""Contig construction from string-graph paths.

Rebuild of fsa Assembly::SaveContigs (src/fsa/assembly.cpp:168-288): each simple
path becomes a contig; the sequence is the first read's oriented sequence plus
each arc's appended segment. Also emits contig *tiles* (read placements:
contig_tiles in the reference), consumed by the polish stage's filter_m4.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from necat_tpu.assembly.overlap_filter import FilterOptions, filter_overlaps
from necat_tpu.assembly.string_graph import Arc, StringGraph, rev_vertex
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.m4 import M4Records


@dataclasses.dataclass
class Tile:
    read: int
    orient: int     # 0 fwd / 1 rev
    ctg_start: int  # placement of the read's contributed segment on the contig
    ctg_end: int


@dataclasses.dataclass
class AssemblyResult:
    contigs: ReadStore
    tiles: List[List[Tile]]          # per contig
    n_paths: int
    min_identity: float
    max_overhang: int


def path_to_contig(path: List[Arc], store: ReadStore) -> Tuple[np.ndarray, List[Tile]]:
    """Concatenate the path's oriented reads into a contig sequence + tiles.

    At each join, the previous read's unaligned tail (arc.trim_u, the overhang
    that end-clamping forgave) is dropped before appending the next read's
    post-overlap segment, so junctions are exact."""
    first = path[0].u
    rid, orient = first // 2, first % 2
    seq_parts = [store.get(rid, rc=bool(orient))]
    tiles = [Tile(rid, orient, 0, len(seq_parts[0]))]
    pos = len(seq_parts[0])
    for a in path:
        if a.trim_u > 0:
            drop = a.trim_u
            while drop > 0 and seq_parts:
                last = seq_parts[-1]
                if len(last) > drop:
                    seq_parts[-1] = last[:-drop]
                    drop = 0
                else:
                    drop -= len(last)
                    seq_parts.pop()
            pos -= a.trim_u - drop
        rid, orient = a.v // 2, a.v % 2
        seg = store.get(rid, rc=bool(orient))[a.seg_start:a.seg_end]
        seq_parts.append(seg)
        tiles.append(Tile(rid, orient, pos, pos + len(seg)))
        pos += len(seg)
    return np.concatenate(seq_parts), tiles


def assemble(
    store: ReadStore,
    m4: M4Records,
    filter_opts: FilterOptions = FilterOptions(),
    min_contig_length: int = 500,
) -> AssemblyResult:
    """Overlap filter -> string graph -> contigs (fsa_ol_filter + fsa_assemble)."""
    fres = filter_overlaps(m4, store.n_reads, filter_opts)
    g = StringGraph.from_overlaps(fres.m4, store.lengths, max_overhang=fres.max_overhang)
    paths = g.assemble()

    seqs, names, all_tiles = [], [], []
    # longest-first, skip tiny contigs
    built = []
    for path in paths:
        seq, tiles = path_to_contig(path, store)
        built.append((seq, tiles))
    # singleton contigs: reads with no active arcs but not contained/filtered
    used = set()
    for path in paths:
        for a in path:
            used.add(a.u // 2)
            used.add(a.v // 2)
    built.sort(key=lambda t: -len(t[0]))
    for seq, tiles in built:
        if len(seq) < min_contig_length:
            continue
        names.append(f"ctg{len(seqs)}")
        seqs.append(seq)
        all_tiles.append(tiles)
    contigs = ReadStore.from_seqs(seqs, names)
    return AssemblyResult(contigs=contigs, tiles=all_tiles, n_paths=len(paths),
                          min_identity=fres.min_identity, max_overhang=fres.max_overhang)
