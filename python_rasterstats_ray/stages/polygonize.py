"""Polygonize: raster -> vector region extraction (GDAL ``gdal_polygonize``
shape): 4-connected components of equal-valued, non-nodata pixels, one
output row per region with its min-flat-index id, value, pixel count and
bounding box.

The reference is zonal/point only; this operator completes the north
rule's raster->vector direction (vector->raster = rasterize/zonal,
raster->vector = this). Distributed plan — the classic two-level
connected-components contraction:

1. Per tile, VECTORIZED local CC: min-label propagation over the 4
   shifted neighbor grids with pointer jumping (labels are absolute flat
   pixel indices; O(log diameter) numpy passes, no per-pixel Python).
   Each tile emits (a) one partial-stats row per LOCAL label and (b) its
   border pixels keyed by the shared tile-edge id — O(area/T) rows total,
   the pixels themselves never leave the tile.
2. ``groupby(edge)`` pairs border pixels across each shared edge (equal
   value + equal offset -> a union edge between two local labels), then
   ``components_auto`` (stages/graph.py) resolves the contracted label
   graph — O(perimeter) nodes, broadcast min-label plan at this scale,
   shuffle plan beyond.
3. The (label -> region) map is broadcast (ray.put) and the partial
   stats rows merge by region with one small groupby.

Exactness: region ids are min flat indices (global min over a region =
min over its tile-local minima), counts/bboxes are integer partials —
the result is layout-invariant and bit-equal to a sequential flood fill.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import cell_decode, cell_id

__all__ = ["polygonize_tiled", "sieve_tiled", "region_group_tiled"]

_SENTINEL = np.iinfo(np.int64).max


def _local_cc(vals: np.ndarray, valid: np.ndarray, r0: int, c0: int, w: int):
    """Vectorized 4-connected min-label CC within one tile. Returns int64
    labels (absolute flat indices; _SENTINEL on invalid pixels)."""
    th, tw = vals.shape
    rr = (r0 + np.arange(th, dtype=np.int64)).reshape(th, 1)
    cc = (c0 + np.arange(tw, dtype=np.int64)).reshape(1, tw)
    lab = np.where(valid, rr * w + cc, _SENTINEL)
    for _ in range(128):
        new = lab.copy()
        # neighbor-min over the 4 shifted grids (equal value, both valid)
        pairs = (
            ((slice(None), slice(0, tw - 1)), (slice(None), slice(1, tw))),  # left-right
            ((slice(0, th - 1), slice(None)), (slice(1, th), slice(None))),  # up-down
        )
        for a, b in pairs:
            m = valid[a] & valid[b] & (vals[a] == vals[b])
            np.minimum(new[a], np.where(m, lab[b], _SENTINEL), out=new[a])
            np.minimum(new[b], np.where(m, lab[a], _SENTINEL), out=new[b])
        # pointer jumping: follow labels twice (labels stay in-tile)
        for _j in range(2):
            fl = new.ravel()
            ok = fl != _SENTINEL
            ql = (fl[ok] // w - r0) * tw + (fl[ok] % w - c0)
            nf = fl.copy()
            nf[ok] = np.minimum(fl[ok], fl[ql])
            new = nf.reshape(th, tw)
        if np.array_equal(new, lab):
            break
        lab = new
    else:  # pragma: no cover - log2(tile area) << 128
        raise RuntimeError("polygonize: local CC did not converge")
    return lab


def polygonize_tiled(tiles_ds, shape: tuple[int, int], nodata: float, tile_size: int = 256):
    """Tile table -> Dataset(region_id, value, px_count, min_row, min_col,
    max_row, max_col), one row per 4-connected equal-value region."""
    from ._cluster import pool  # noqa: F401  (groupby stages size themselves)
    from .graph import components_auto

    h, w = shape

    def local(batch: pa.Table) -> pa.Table:
        from .focal import _tile_arrays

        lab_o, val_o, cnt_o, rmin_o, cmin_o, rmax_o, cmax_o = [], [], [], [], [], [], []
        ek_o, pos_o, side_o, bval_o, blab_o = [], [], [], [], []
        ntr = (h + tile_size - 1) // tile_size
        ntc = (w + tile_size - 1) // tile_size
        for cell, r0, c0, arr in _tile_arrays(batch):
            tr, tc = cell_decode(cell)
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            valid = arr != float(nodata)
            th, tw = a.shape
            lab = _local_cc(a, valid, r0, c0, w)
            # (a) per-local-label partials
            fl = lab.ravel()
            va = a.ravel()
            ok = fl != _SENTINEL
            ul, inv = np.unique(fl[ok], return_inverse=True)
            n = len(ul)
            rr = (r0 + np.arange(th, dtype=np.int64)).repeat(tw)[ok]
            cc2 = np.tile(c0 + np.arange(tw, dtype=np.int64), th)[ok]
            cnt = np.bincount(inv, minlength=n).astype(np.int64)
            rmin = np.full(n, _SENTINEL)
            cmin = np.full(n, _SENTINEL)
            rmax = np.full(n, -1, np.int64)
            cmax = np.full(n, -1, np.int64)
            np.minimum.at(rmin, inv, rr)
            np.minimum.at(cmin, inv, cc2)
            np.maximum.at(rmax, inv, rr)
            np.maximum.at(cmax, inv, cc2)
            vfirst = np.zeros(n, np.int64)
            vfirst[inv] = va[ok]  # all members share the value
            lab_o.append(ul)
            val_o.append(vfirst)
            cnt_o.append(cnt)
            rmin_o.append(rmin)
            cmin_o.append(cmin)
            rmax_o.append(rmax)
            cmax_o.append(cmax)
            # (b) border rows keyed by shared-edge id (2*cell [+1])
            edges = []
            if tc + 1 < ntc:  # right edge of this cell
                edges.append((int(cell_id(tr, tc)) * 2, lab[:, -1], a[:, -1],
                              valid[:, -1], r0 + np.arange(th, dtype=np.int64), 0))
            if tc > 0:  # left edge pairs with the WEST neighbor's edge id
                edges.append((int(cell_id(tr, tc - 1)) * 2, lab[:, 0], a[:, 0],
                              valid[:, 0], r0 + np.arange(th, dtype=np.int64), 1))
            if tr + 1 < ntr:  # bottom edge
                edges.append((int(cell_id(tr, tc)) * 2 + 1, lab[-1, :], a[-1, :],
                              valid[-1, :], c0 + np.arange(tw, dtype=np.int64), 0))
            if tr > 0:  # top edge pairs with the NORTH neighbor's edge id
                edges.append((int(cell_id(tr - 1, tc)) * 2 + 1, lab[0, :], a[0, :],
                              valid[0, :], c0 + np.arange(tw, dtype=np.int64), 1))
            for ekey, elab, eval_, evalid, epos, side in edges:
                keep = evalid
                k = int(keep.sum())
                if k == 0:
                    continue
                ek_o.append(np.full(k, ekey, np.int64))
                pos_o.append(epos[keep])
                side_o.append(np.full(k, side, np.int8))
                bval_o.append(eval_[keep])
                blab_o.append(elab[keep])
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        stats = pa.table(
            {
                "label": pa.array(cat(lab_o, np.int64), pa.int64()),
                "value": pa.array(cat(val_o, np.int64), pa.int64()),
                "cnt": pa.array(cat(cnt_o, np.int64), pa.int64()),
                "rmin": pa.array(cat(rmin_o, np.int64), pa.int64()),
                "cmin": pa.array(cat(cmin_o, np.int64), pa.int64()),
                "rmax": pa.array(cat(rmax_o, np.int64), pa.int64()),
                "cmax": pa.array(cat(cmax_o, np.int64), pa.int64()),
            }
        )
        border = pa.table(
            {
                "ekey": pa.array(cat(ek_o, np.int64), pa.int64()),
                "pos": pa.array(cat(pos_o, np.int64), pa.int64()),
                "side": pa.array(cat(side_o, np.int8), pa.int8()),
                "bval": pa.array(cat(bval_o, np.int64), pa.int64()),
                "blab": pa.array(cat(blab_o, np.int64), pa.int64()),
            }
        )
        # one combined stream, discriminated by which columns are null
        n_s, n_b = len(stats), len(border)
        return pa.table(
            {
                "kind": pa.array([0] * n_s + [1] * n_b, pa.int8()),
                "label": pa.concat_arrays(
                    [stats["label"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "value": pa.concat_arrays(
                    [stats["value"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "cnt": pa.concat_arrays(
                    [stats["cnt"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "rmin": pa.concat_arrays(
                    [stats["rmin"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "cmin": pa.concat_arrays(
                    [stats["cmin"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "rmax": pa.concat_arrays(
                    [stats["rmax"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "cmax": pa.concat_arrays(
                    [stats["cmax"].combine_chunks(), pa.nulls(n_b, pa.int64())]
                ),
                "ekey": pa.concat_arrays(
                    [pa.nulls(n_s, pa.int64()), border["ekey"].combine_chunks()]
                ),
                "pos": pa.concat_arrays(
                    [pa.nulls(n_s, pa.int64()), border["pos"].combine_chunks()]
                ),
                "side": pa.concat_arrays(
                    [pa.nulls(n_s, pa.int8()), border["side"].combine_chunks()]
                ),
                "bval": pa.concat_arrays(
                    [pa.nulls(n_s, pa.int64()), border["bval"].combine_chunks()]
                ),
                "blab": pa.concat_arrays(
                    [pa.nulls(n_s, pa.int64()), border["blab"].combine_chunks()]
                ),
            }
        )

    import pyarrow.compute as pc

    both = tiles_ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    both = both.materialize()  # consumed twice (stats + border), tiny rows

    def pick(kind: int, cols: list[str]):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], kind)).select(cols)

        return _f

    stats = both.map_batches(
        pick(0, ["label", "value", "cnt", "rmin", "cmin", "rmax", "cmax"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    border = both.map_batches(
        pick(1, ["ekey", "pos", "side", "bval", "blab"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def stitch(group: pa.Table) -> pa.Table:
        pos = group["pos"].to_numpy()
        side = group["side"].to_numpy()
        val = group["bval"].to_numpy()
        lab = group["blab"].to_numpy()
        a, b = side == 0, side == 1
        # align the two sides by offset along the edge
        oa = np.argsort(pos[a], kind="stable")
        ob = np.argsort(pos[b], kind="stable")
        pa_, pb = pos[a][oa], pos[b][ob]
        common, ia, ib = np.intersect1d(pa_, pb, return_indices=True)
        va, vb = val[a][oa][ia], val[b][ob][ib]
        la, lb = lab[a][oa][ia], lab[b][ob][ib]
        m = va == vb
        src, dst = la[m], lb[m]
        if len(src):
            uniq = np.unique(np.stack([src, dst], axis=1), axis=0)
            src, dst = uniq[:, 0], uniq[:, 1]
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = border.groupby("ekey").map_groups(stitch, batch_format="pyarrow")
    edges = edges.materialize()

    def node_stream(batch: pa.Table) -> pa.Table:
        ns = np.unique(
            np.concatenate([batch["src"].to_numpy(), batch["dst"].to_numpy()])
        )
        return pa.table({"node": pa.array(ns, pa.int64())})

    import ray

    if edges.count() > 0:
        nodes = (
            edges.map_batches(node_stream, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        )
        cc = components_auto(edges, nodes)
        cc_tbl = pa.concat_tables(cc.iter_batches(batch_format="pyarrow"))
        order = np.argsort(cc_tbl["node"].to_numpy(), kind="stable")
        root_ref = ray.put(
            (cc_tbl["node"].to_numpy()[order], cc_tbl["lbl"].to_numpy()[order])
        )
    else:
        root_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def to_region(batch: pa.Table) -> pa.Table:
        nodes_s, roots = ray.get(root_ref)
        lab = batch["label"].to_numpy()
        if len(nodes_s):
            pos = np.clip(np.searchsorted(nodes_s, lab), 0, len(nodes_s) - 1)
            hit = nodes_s[pos] == lab
            region = np.where(hit, roots[pos], lab)
        else:
            region = lab
        return batch.set_column(0, "region_id", pa.array(region, pa.int64()))

    regioned = stats.map_batches(to_region, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "region_id": pa.array([int(group["region_id"][0].as_py())], pa.int64()),
                "value": pa.array([int(group["value"][0].as_py())], pa.int64()),
                "px_count": pa.array([int(np.sum(group["cnt"].to_numpy()))], pa.int64()),
                "min_row": pa.array([int(np.min(group["rmin"].to_numpy()))], pa.int64()),
                "min_col": pa.array([int(np.min(group["cmin"].to_numpy()))], pa.int64()),
                "max_row": pa.array([int(np.max(group["rmax"].to_numpy()))], pa.int64()),
                "max_col": pa.array([int(np.max(group["cmax"].to_numpy()))], pa.int64()),
            }
        )

    return regioned.groupby("region_id").map_groups(merge, batch_format="pyarrow")


def sieve_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    threshold: int,
    tile_size: int = 256,
):
    """Sieve filter (GDAL ``gdal_sieve`` shape): 4-connected equal-value
    regions smaller than ``threshold`` pixels take the VALUE of their
    largest neighbor region — one-pass semantics: every size is measured
    on the ORIGINAL labeling, ties break to the smaller region id, and a
    small region with no valid neighbor keeps its value. Returns a
    rewritten tile table (same schema/dtype as the input tiles).

    Distributed plan: the polygonize two-level contraction grows an
    ADJACENCY stream — in-tile different-value valid neighbor pairs plus
    the same pairs across shared tile edges (the stitch join already
    aligns both sides; equal values emit union edges, differing values
    emit adjacency edges). Pixels never cross an exchange: tiles emit
    O(perimeter + #local-labels) thin rows, the rewrite pass re-derives
    local labels per tile (deterministic) and applies two broadcast maps.

    Documented bound: the per-region size table and region adjacency
    pairs are gathered to the driver for the vectorized argmax (thin
    rows, same order as polygonize's own output); past that bound the
    argmax is one groupby(region) over the adjacency stream — noted, not
    needed at this scale."""
    import pyarrow.compute as pc
    import ray

    from .focal import _tile_arrays
    from .graph import components_auto

    h, w = shape
    ntr = (h + tile_size - 1) // tile_size
    ntc = (w + tile_size - 1) // tile_size

    def local(batch: pa.Table) -> pa.Table:
        lab_o, val_o, cnt_o = [], [], []
        ek_o, pos_o, side_o, bval_o, blab_o = [], [], [], [], []
        aa_o, ab_o = [], []
        for cell, r0, c0, arr in _tile_arrays(batch):
            tr, tc = cell_decode(cell)
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            valid = arr != float(nodata)
            th, tw = a.shape
            lab = _local_cc(a, valid, r0, c0, w)
            fl = lab.ravel()
            ok = fl != _SENTINEL
            ul, inv = np.unique(fl[ok], return_inverse=True)
            cnt = np.bincount(inv, minlength=len(ul)).astype(np.int64)
            vfirst = np.zeros(len(ul), np.int64)
            vfirst[inv] = a.ravel()[ok]
            lab_o.append(ul)
            val_o.append(vfirst)
            cnt_o.append(cnt)
            # in-tile adjacency: valid neighbor pairs with DIFFERENT values
            for sa, sb in (
                ((slice(None), slice(0, tw - 1)), (slice(None), slice(1, tw))),
                ((slice(0, th - 1), slice(None)), (slice(1, th), slice(None))),
            ):
                m = valid[sa] & valid[sb] & (a[sa] != a[sb])
                if m.any():
                    aa_o.append(lab[sa][m])
                    ab_o.append(lab[sb][m])
            # border rows (valid pixels; the stitch classifies pairs)
            edges = []
            if tc + 1 < ntc:
                edges.append((int(cell_id(tr, tc)) * 2, lab[:, -1], a[:, -1],
                              valid[:, -1], r0 + np.arange(th, dtype=np.int64), 0))
            if tc > 0:
                edges.append((int(cell_id(tr, tc - 1)) * 2, lab[:, 0], a[:, 0],
                              valid[:, 0], r0 + np.arange(th, dtype=np.int64), 1))
            if tr + 1 < ntr:
                edges.append((int(cell_id(tr, tc)) * 2 + 1, lab[-1, :], a[-1, :],
                              valid[-1, :], c0 + np.arange(tw, dtype=np.int64), 0))
            if tr > 0:
                edges.append((int(cell_id(tr - 1, tc)) * 2 + 1, lab[0, :], a[0, :],
                              valid[0, :], c0 + np.arange(tw, dtype=np.int64), 1))
            for ekey, elab, eval_, evalid, epos, side in edges:
                k = int(evalid.sum())
                if k == 0:
                    continue
                ek_o.append(np.full(k, ekey, np.int64))
                pos_o.append(epos[evalid])
                side_o.append(np.full(k, side, np.int8))
                bval_o.append(eval_[evalid])
                blab_o.append(elab[evalid])
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        n_s = sum(len(x) for x in lab_o)
        n_b = sum(len(x) for x in ek_o)
        n_a = sum(len(x) for x in aa_o)

        def col(vals, n_before, n_after, typ):
            return pa.concat_arrays(
                [pa.nulls(n_before, typ), pa.array(vals, typ), pa.nulls(n_after, typ)]
            )

        return pa.table(
            {
                "kind": pa.array([0] * n_s + [1] * n_b + [2] * n_a, pa.int8()),
                "label": col(cat(lab_o, np.int64), 0, n_b + n_a, pa.int64()),
                "value": col(cat(val_o, np.int64), 0, n_b + n_a, pa.int64()),
                "cnt": col(cat(cnt_o, np.int64), 0, n_b + n_a, pa.int64()),
                "ekey": col(cat(ek_o, np.int64), n_s, n_a, pa.int64()),
                "pos": col(cat(pos_o, np.int64), n_s, n_a, pa.int64()),
                "side": col(cat(side_o, np.int8), n_s, n_a, pa.int8()),
                "bval": col(cat(bval_o, np.int64), n_s, n_a, pa.int64()),
                "blab": col(cat(blab_o, np.int64), n_s, n_a, pa.int64()),
                "la": col(cat(aa_o, np.int64), n_s + n_b, 0, pa.int64()),
                "lb": col(cat(ab_o, np.int64), n_s + n_b, 0, pa.int64()),
            }
        )

    both = tiles_ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    both = both.materialize()

    def pick(kind: int, cols: list[str]):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], kind)).select(cols)

        return _f

    stats = both.map_batches(pick(0, ["label", "value", "cnt"]),
                             batch_format="pyarrow", zero_copy_batch=True)
    border = both.map_batches(pick(1, ["ekey", "pos", "side", "bval", "blab"]),
                              batch_format="pyarrow", zero_copy_batch=True)
    adj_local = both.map_batches(pick(2, ["la", "lb"]),
                                 batch_format="pyarrow", zero_copy_batch=True)

    def stitch(group: pa.Table) -> pa.Table:
        pos = group["pos"].to_numpy()
        side = group["side"].to_numpy()
        val = group["bval"].to_numpy()
        lab = group["blab"].to_numpy()
        sa, sb = side == 0, side == 1
        oa = np.argsort(pos[sa], kind="stable")
        ob = np.argsort(pos[sb], kind="stable")
        _common, ia, ib = np.intersect1d(pos[sa][oa], pos[sb][ob], return_indices=True)
        va, vb = val[sa][oa][ia], val[sb][ob][ib]
        la, lb = lab[sa][oa][ia], lab[sb][ob][ib]
        same = va == vb
        return pa.table(
            {
                "src": pa.array(la, pa.int64()),
                "dst": pa.array(lb, pa.int64()),
                "same": pa.array(same.astype(np.int8), pa.int8()),
            }
        )

    edges_all = border.groupby("ekey").map_groups(stitch, batch_format="pyarrow")
    edges_all = edges_all.materialize()
    union_edges = edges_all.map_batches(
        lambda b: b.filter(pc.equal(b["same"], 1)).select(["src", "dst"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    adj_cross = edges_all.map_batches(
        lambda b: b.filter(pc.equal(b["same"], 0))
        .select(["src", "dst"]).rename_columns(["la", "lb"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def node_stream(batch: pa.Table) -> pa.Table:
        ns = np.unique(np.concatenate([batch["src"].to_numpy(), batch["dst"].to_numpy()]))
        return pa.table({"node": pa.array(ns, pa.int64())})

    if union_edges.count() > 0:
        nodes = (
            union_edges.map_batches(node_stream, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        )
        cc = components_auto(union_edges, nodes)
        cc_tbl = pa.concat_tables(cc.iter_batches(batch_format="pyarrow"))
        order = np.argsort(cc_tbl["node"].to_numpy(), kind="stable")
        root_nodes = cc_tbl["node"].to_numpy()[order]
        root_lbls = cc_tbl["lbl"].to_numpy()[order]
    else:
        root_nodes = np.empty(0, np.int64)
        root_lbls = np.empty(0, np.int64)
    root_ref = ray.put((root_nodes, root_lbls))

    def _to_region(lab: np.ndarray) -> np.ndarray:
        nodes_s, roots = ray.get(root_ref)
        if len(nodes_s) == 0 or len(lab) == 0:
            return lab
        p = np.clip(np.searchsorted(nodes_s, lab), 0, len(nodes_s) - 1)
        hit = nodes_s[p] == lab
        return np.where(hit, roots[p], lab)

    # thin driver gather: per-region sizes/values and region adjacency
    sizes_parts = list(stats.iter_batches(batch_format="pyarrow"))
    if not sizes_parts:
        return tiles_ds
    sizes_tbl = pa.concat_tables(sizes_parts)
    reg = _to_region(sizes_tbl["label"].to_numpy())
    ureg, rinv = np.unique(reg, return_inverse=True)
    rsize = np.zeros(len(ureg), np.int64)
    np.add.at(rsize, rinv, sizes_tbl["cnt"].to_numpy())
    rval = np.zeros(len(ureg), np.int64)
    rval[rinv] = sizes_tbl["value"].to_numpy()

    adj_parts = [
        (b["la"].to_numpy(), b["lb"].to_numpy())
        for b in adj_local.union(adj_cross).iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if adj_parts:
        la = _to_region(np.concatenate([p[0] for p in adj_parts]))
        lb = _to_region(np.concatenate([p[1] for p in adj_parts]))
        # both directions so every region sees all its neighbors
        ra = np.concatenate([la, lb])
        rb = np.concatenate([lb, la])
        keep = ra != rb
        ra, rb = ra[keep], rb[keep]
    else:
        ra = rb = np.empty(0, np.int64)

    # replacement: per small region, neighbor with (size DESC, id ASC)
    small = rsize < int(threshold)
    if len(ra):
        ia = np.searchsorted(ureg, ra)
        ib = np.searchsorted(ureg, rb)
        cand = small[ia]
        ia, ib = ia[cand], ib[cand]
        # lexsort: group by ia, best (size desc, region asc) first
        order = np.lexsort((ureg[ib], -rsize[ib], ia))
        ia, ib = ia[order], ib[order]
        first = np.ones(len(ia), bool)
        first[1:] = ia[1:] != ia[:-1]
        src_regions = ureg[ia[first]]
        new_vals = rval[ib[first]]
    else:
        src_regions = np.empty(0, np.int64)
        new_vals = np.empty(0, np.int64)
    repl_ref = ray.put((src_regions, new_vals))

    def rewrite(batch: pa.Table) -> pa.Table:
        srcs, nvals = ray.get(repl_ref)
        cells, fro, fco, fh, fw, dts, payload = [], [], [], [], [], [], []
        for cell, r0, c0, arr in _tile_arrays(batch):
            valid = arr != float(nodata)
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            lab = _local_cc(a, valid, r0, c0, w)
            out = arr.copy()
            if len(srcs):
                fl = lab.ravel()
                ok = fl != _SENTINEL
                region = _to_region(fl[ok])
                p = np.clip(np.searchsorted(srcs, region), 0, len(srcs) - 1)
                hit = srcs[p] == region
                rep = out.ravel().copy()
                tgt = np.where(ok)[0][hit]
                rep[tgt] = nvals[p[hit]].astype(out.dtype)
                out = rep.reshape(out.shape)
            cells.append(cell)
            fro.append(r0)
            fco.append(c0)
            fh.append(out.shape[0])
            fw.append(out.shape[1])
            dts.append(str(out.dtype))
            payload.append(np.ascontiguousarray(out).tobytes())
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "row_off": pa.array(fro, pa.int32()),
                "col_off": pa.array(fco, pa.int32()),
                "height": pa.array(fh, pa.int32()),
                "width": pa.array(fw, pa.int32()),
                "dtype": pa.array(dts, pa.string()),
                "pixels": pa.array(payload, pa.binary()),
            }
        )

    return tiles_ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


def region_group_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    tile_size: int = 256,
    mod: int = 1,
):
    """Region-group (ArcGIS ``RegionGroup`` shape): every valid pixel
    annotated with its 4-connected equal-value region's id and GLOBAL
    pixel count — the per-pixel view of polygonize. Same two-level CC
    contraction (per-tile vectorized labels, edge stitch,
    components_auto), region sizes merged from per-tile label partials;
    a second pass re-derives local labels per tile (deterministic) and
    gathers (region_id, region_px) through two broadcast maps. Output:
    (row, col, region_id, region_px) for pixels with
    (row*W + col) % mod == 0."""
    import pyarrow.compute as pc
    import ray

    from .focal import _tile_arrays
    from .graph import components_auto

    h, w = shape
    ntr = (h + tile_size - 1) // tile_size
    ntc = (w + tile_size - 1) // tile_size

    def local(batch: pa.Table) -> pa.Table:
        lab_o, cnt_o = [], []
        ek_o, pos_o, side_o, bval_o, blab_o = [], [], [], [], []
        for cell, r0, c0, arr in _tile_arrays(batch):
            tr, tc = cell_decode(cell)
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            valid = arr != float(nodata)
            th, tw = a.shape
            lab = _local_cc(a, valid, r0, c0, w)
            fl = lab.ravel()
            ok = fl != _SENTINEL
            ul, inv = np.unique(fl[ok], return_inverse=True)
            lab_o.append(ul)
            cnt_o.append(np.bincount(inv, minlength=len(ul)).astype(np.int64))
            edges = []
            if tc + 1 < ntc:
                edges.append((int(cell_id(tr, tc)) * 2, lab[:, -1], a[:, -1],
                              valid[:, -1], r0 + np.arange(th, dtype=np.int64), 0))
            if tc > 0:
                edges.append((int(cell_id(tr, tc - 1)) * 2, lab[:, 0], a[:, 0],
                              valid[:, 0], r0 + np.arange(th, dtype=np.int64), 1))
            if tr + 1 < ntr:
                edges.append((int(cell_id(tr, tc)) * 2 + 1, lab[-1, :], a[-1, :],
                              valid[-1, :], c0 + np.arange(tw, dtype=np.int64), 0))
            if tr > 0:
                edges.append((int(cell_id(tr - 1, tc)) * 2 + 1, lab[0, :], a[0, :],
                              valid[0, :], c0 + np.arange(tw, dtype=np.int64), 1))
            for ekey, elab, eval_, evalid, epos, side in edges:
                k = int(evalid.sum())
                if k == 0:
                    continue
                ek_o.append(np.full(k, ekey, np.int64))
                pos_o.append(epos[evalid])
                side_o.append(np.full(k, side, np.int8))
                bval_o.append(eval_[evalid])
                blab_o.append(elab[evalid])
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        n_s = sum(len(x) for x in lab_o)
        n_b = sum(len(x) for x in ek_o)

        def col(vals, before, after, typ):
            return pa.concat_arrays(
                [pa.nulls(before, typ), pa.array(vals, typ), pa.nulls(after, typ)]
            )

        return pa.table(
            {
                "kind": pa.array([0] * n_s + [1] * n_b, pa.int8()),
                "label": col(cat(lab_o, np.int64), 0, n_b, pa.int64()),
                "cnt": col(cat(cnt_o, np.int64), 0, n_b, pa.int64()),
                "ekey": col(cat(ek_o, np.int64), n_s, 0, pa.int64()),
                "pos": col(cat(pos_o, np.int64), n_s, 0, pa.int64()),
                "side": col(cat(side_o, np.int8), n_s, 0, pa.int8()),
                "bval": col(cat(bval_o, np.int64), n_s, 0, pa.int64()),
                "blab": col(cat(blab_o, np.int64), n_s, 0, pa.int64()),
            }
        )

    both = tiles_ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    both = both.materialize()

    stats = both.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["label", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    border = both.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            ["ekey", "pos", "side", "bval", "blab"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def stitch(group: pa.Table) -> pa.Table:
        pos = group["pos"].to_numpy()
        side = group["side"].to_numpy()
        val = group["bval"].to_numpy()
        lab = group["blab"].to_numpy()
        sa, sb = side == 0, side == 1
        oa = np.argsort(pos[sa], kind="stable")
        ob = np.argsort(pos[sb], kind="stable")
        _c, ia, ib = np.intersect1d(pos[sa][oa], pos[sb][ob], return_indices=True)
        m = val[sa][oa][ia] == val[sb][ob][ib]
        return pa.table(
            {
                "src": pa.array(lab[sa][oa][ia][m], pa.int64()),
                "dst": pa.array(lab[sb][ob][ib][m], pa.int64()),
            }
        )

    edges = border.groupby("ekey").map_groups(stitch, batch_format="pyarrow").materialize()

    def node_stream(batch: pa.Table) -> pa.Table:
        ns = np.unique(np.concatenate([batch["src"].to_numpy(), batch["dst"].to_numpy()]))
        return pa.table({"node": pa.array(ns, pa.int64())})

    if edges.count() > 0:
        nodes = (
            edges.map_batches(node_stream, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        )
        cc = components_auto(edges, nodes)
        cc_tbl = pa.concat_tables(cc.iter_batches(batch_format="pyarrow"))
        order = np.argsort(cc_tbl["node"].to_numpy(), kind="stable")
        root_nodes = cc_tbl["node"].to_numpy()[order]
        root_lbls = cc_tbl["lbl"].to_numpy()[order]
    else:
        root_nodes = np.empty(0, np.int64)
        root_lbls = np.empty(0, np.int64)

    stats_tbl = pa.concat_tables(stats.iter_batches(batch_format="pyarrow"))
    lab = stats_tbl["label"].to_numpy()
    if len(root_nodes):
        p = np.clip(np.searchsorted(root_nodes, lab), 0, len(root_nodes) - 1)
        hit = root_nodes[p] == lab
        reg = np.where(hit, root_lbls[p], lab)
    else:
        reg = lab
    ureg, rinv = np.unique(reg, return_inverse=True)
    rsize = np.zeros(len(ureg), np.int64)
    np.add.at(rsize, rinv, stats_tbl["cnt"].to_numpy())
    maps_ref = ray.put((root_nodes, root_lbls, ureg, rsize))

    def sample(batch: pa.Table) -> pa.Table:
        root_n, root_l, ureg_, rsize_ = ray.get(maps_ref)
        r_o, c_o, id_o, px_o = [], [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            valid = arr != float(nodata)
            th, tw = a.shape
            lab = _local_cc(a, valid, r0, c0, w)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc2 = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = valid & ((rr * w + cc2) % mod == 0)
            if not pick.any():
                continue
            fl = lab[pick]
            if len(root_n):
                p = np.clip(np.searchsorted(root_n, fl), 0, len(root_n) - 1)
                hit = root_n[p] == fl
                fl = np.where(hit, root_l[p], fl)
            sz = rsize_[np.searchsorted(ureg_, fl)]
            r_o.append(np.broadcast_to(rr, (th, tw))[pick])
            c_o.append(np.broadcast_to(cc2, (th, tw))[pick])
            id_o.append(fl)
            px_o.append(sz)
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "row": pa.array(cat(r_o), pa.int64()),
                "col": pa.array(cat(c_o), pa.int64()),
                "region_id": pa.array(cat(id_o), pa.int64()),
                "region_px": pa.array(cat(px_o), pa.int64()),
            }
        )

    return tiles_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
