"""Host-side 16-wide BVH build: collapse the binary SAH tree, pack 128-float
node/leaf records, order children per ray octant.

Why 16-wide on TPU: incoherent gathers cost ~one ROW per lane-step no matter
the row width (measured on v5e: (N,8) and (N,128) row gathers both run at
~50-110 M rows/s), so traversal throughput is set by ROWS PER RAY. A binary
threaded tree needs ~100-190 rows/ray (accel/traverse.py); a 16-ary tree with
8-triangle leaves needs ~12-25: one 128-float record carries either 16 child
AABBs + links or 8 full triangles. This is the TPU replacement for the
reference's binary stack traversal (rustracer-core/src/bvh/mod.rs:366-433);
the SAH build itself (accel/bvh.py / native builder) is reused and collapsed.

Unified record table, (R, 128) float32:
  interior record (tag >= 0, tag = n_children):
    [0]       tag (int32 bits)
    [1..17)   16 child row links (int32 bits; -1 = empty slot), pre-offset
              into the octant copy for interior children, absolute into the
              shared leaf block for leaf children
    [17..113) child AABBs, component-major: lo_x[16] lo_y[16] lo_z[16]
              hi_x[16] hi_y[16] hi_z[16]  (empty slots = +inf/-inf never-hit)
  leaf record (tag < 0, -tag = n_tris <= 8):
    [0]       tag
    [1..9)    8 triangle ids (int32 bits; -1 pads)
    [9..81)   vertices component-major: p0x[8] p0y[8] p0z[8] p1x[8] ...
              p2z[8] (pad tris = degenerate zeros, never hit)

Row layout: rows [o*Ni, (o+1)*Ni) hold octant o's interior copy (children
sorted near-to-far along the octant direction); rows [8*Ni, 8*Ni+Nl) hold
the SHARED leaf records. Octant o's root is row o*Ni.
"""
from __future__ import annotations

import numpy as np

WIDTH = 16        # children per interior node
LEAF_K = 8        # triangles per leaf record
REC = 128         # floats per record row


def _area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def collapse_wide(nodes_lo, nodes_hi, meta):
    """Binary flattened BVH (accel/bvh.py layout) → wide tree.

    Returns (wide_children, wide_is_leaf_child, n_wide, wide_of_binary):
      wide_children: list of lists of binary-node ids (each a child subtree
        root that is either collapsed into its own wide node or is a binary
        leaf)
    plus depth. Expansion greedily replaces the largest-surface-area
    interior child with its two binary children until WIDTH children or all
    leaves (the standard BVH-collapse heuristic).
    """
    is_leaf = meta[:, 1] > 0
    c2 = meta[:, 0]
    n = meta.shape[0]
    # descendant-leaf counts, bottom-up (children follow parents in the DFS
    # flattening, so a reverse sweep sees children first)
    leaf_cnt = np.where(is_leaf, 1, 0).astype(np.int64)
    for i in range(n - 1, -1, -1):
        if not is_leaf[i]:
            leaf_cnt[i] = leaf_cnt[i + 1] + leaf_cnt[c2[i]]

    wide_children = []          # per wide node: list of binary ids
    wide_child_leaf = []        # per wide node: parallel bools
    todo = [0]                  # binary roots that become wide nodes
    wide_of_binary = {}
    depth_of = {0: 0}
    max_depth = 0
    while todo:
        b = todo.pop()
        if b in wide_of_binary:
            continue
        wid = len(wide_children)
        wide_of_binary[b] = wid
        if is_leaf[b]:
            # shouldn't happen for roots (callers wrap leaf roots)
            wide_children.append([b])
            wide_child_leaf.append([True])
            continue
        kids = [int(b) + 1, int(c2[b])]
        while len(kids) < WIDTH:
            # Hybrid expansion: absorb a small subtree WHOLE when its
            # leaves fit in the remaining slots (prefer the smallest such),
            # else split the LARGEST subtree (drives the top of the tree
            # toward 16 balanced branches). Pure largest-area expansion
            # left the bottom as 2-3-child nodes (mean 6.5 children);
            # pure smallest-first built depth-15 chains of one-big-child
            # nodes. The hybrid measures ~15 mean children at depth ~5.
            room = WIDTH - (len(kids) - 1)
            best, best_c = -1, None
            for i, k in enumerate(kids):
                if is_leaf[k]:
                    continue
                if leaf_cnt[k] <= room and (best_c is None
                                            or leaf_cnt[k] < best_c):
                    best, best_c = i, leaf_cnt[k]
            if best < 0:
                for i, k in enumerate(kids):
                    if not is_leaf[k] and (best_c is None
                                           or leaf_cnt[k] > best_c):
                        best, best_c = i, leaf_cnt[k]
            if best < 0:
                break
            k = kids.pop(best)
            kids.extend([k + 1, int(c2[k])])
        wide_children.append(kids)
        wide_child_leaf.append([bool(is_leaf[k]) for k in kids])
        d = depth_of[b] + 1
        for k, lf in zip(kids, wide_child_leaf[-1]):
            if not lf:
                todo.append(k)
                depth_of[k] = d
                max_depth = max(max_depth, d)
    return wide_children, wide_child_leaf, wide_of_binary, max_depth + 1


def _gather_leaf_tris(meta, prims, binary_leaves):
    """Binary leaf ids → (tids (L, 8) int32 padded -1). Binary leaves hold
    ≤ LEAF_K prims when the binary build uses max_prims=LEAF_K."""
    L = len(binary_leaves)
    tids = np.full((L, LEAF_K), -1, np.int32)
    for j, b in enumerate(binary_leaves):
        off, cnt = int(meta[b, 0]), int(meta[b, 1])
        assert cnt <= LEAF_K, f"binary leaf has {cnt} > {LEAF_K} prims"
        tids[j, :cnt] = prims[off:off + cnt]
    return tids


def pack_wide(nodes_lo, nodes_hi, meta, prims, tv_p, t_idx):
    """→ dict(bvh16_table (R,128) f32, bvh16_roots (8,) i32, depth int).

    Builds the collapsed 16-wide tree with 8 per-octant interior copies
    (children pre-sorted near-to-far along the octant direction) over one
    shared leaf block.
    """
    is_leaf_b = meta[:, 1] > 0
    if is_leaf_b[0]:
        # wrap a leaf root in a 1-child interior
        wide_children = [[0]]
        wide_child_leaf = [[True]]
        wide_map = {0: 0}
        depth = 2
    else:
        wide_children, wide_child_leaf, wide_map, depth = collapse_wide(
            nodes_lo, nodes_hi, meta)
    Ni = len(wide_children)

    # shared leaf block: one leaf record per binary-leaf child
    leaf_rows = {}
    binary_leaves = []
    for kids, lfs in zip(wide_children, wide_child_leaf):
        for b, lf in zip(kids, lfs):
            if lf and b not in leaf_rows:
                leaf_rows[b] = len(binary_leaves)
                binary_leaves.append(b)
    Nl = len(binary_leaves)
    tids = _gather_leaf_tris(meta, prims, binary_leaves)

    leaf_rec = np.zeros((max(Nl, 1), REC), np.float32)
    leaf_rec[:, 0] = np.float32(0)
    if Nl:
        ntri = (tids >= 0).sum(1).astype(np.int32)
        leaf_rec[:, 0] = (-ntri).view(np.float32)
        leaf_rec[:, 1:9] = tids.view(np.float32)
        safe = np.maximum(tids, 0)
        verts = tv_p[t_idx[safe]].astype(np.float32)   # (L, 8, 3, 3)
        verts[tids < 0] = 0.0
        # component-major: p{0,1,2}{x,y,z} blocks of 8
        for v in range(3):
            for c in range(3):
                blk = 9 + (v * 3 + c) * 8
                leaf_rec[:, blk:blk + 8] = verts[:, :, v, c]

    # interior records per octant
    signs = np.array([[1 - 2 * ((o >> a) & 1) for a in range(3)]
                      for o in range(8)], np.float32)   # (8, 3)
    leaf_base = 8 * Ni
    table = np.zeros((8 * Ni + max(Nl, 1), REC), np.float32)
    roots = np.arange(8, dtype=np.int32) * Ni
    INF = np.float32(np.inf)
    for wid, (kids, lfs) in enumerate(zip(wide_children, wide_child_leaf)):
        k = len(kids)
        klo = nodes_lo[kids]
        khi = nodes_hi[kids]
        cent = 0.5 * (klo + khi)
        links = np.empty(k, np.int32)
        for j, (b, lf) in enumerate(zip(kids, lfs)):
            links[j] = leaf_base + leaf_rows[b] if lf else wide_map[b]
        for o in range(8):
            key = cent @ signs[o]
            perm = np.argsort(key, kind="stable")
            row = o * Ni + wid
            rec = table[row]
            rec[0] = np.int32(k).view(np.float32)
            lk = links[perm]
            # interior children offset into THIS octant's copy
            lk_off = np.where(lk < leaf_base,
                              lk + o * Ni, lk).astype(np.int32)
            lnk = np.full(WIDTH, -1, np.int32)
            lnk[:k] = lk_off
            rec[1:17] = lnk.view(np.float32)
            box = np.empty((6, WIDTH), np.float32)
            box[0:3, :] = INF          # empty slots: never-hit boxes
            box[3:6, :] = -INF
            box[0:3, :k] = klo[perm].T
            box[3:6, :k] = khi[perm].T
            rec[17:113] = box.reshape(-1)
    table[leaf_base:] = leaf_rec
    return dict(bvh16_table=table, bvh16_roots=roots,
                bvh16_depth=np.int32(depth))


def build_wide_arrays(tris, split_method="sah"):
    """Full pipeline: binary SAH build (max_prims=LEAF_K) → collapse →
    packed wide arrays. Returns None when there are no triangles."""
    if tris is None or len(tris["t_idx"]) == 0:
        return None
    from .bvh import build_bvh, triangle_bounds
    lo, hi = triangle_bounds(np.asarray(tris["tv_p"]),
                             np.asarray(tris["t_idx"]))
    from rustracer_tpu.native import build_bvh_native
    built = build_bvh_native(lo, hi, split_method, LEAF_K)
    if built is None:
        built = build_bvh(lo, hi, split_method, max_prims=LEAF_K)
    nodes_lo, nodes_hi, meta, prims = built
    return pack_wide(nodes_lo, nodes_hi, meta, prims,
                     np.asarray(tris["tv_p"], np.float32),
                     np.asarray(tris["t_idx"]))
