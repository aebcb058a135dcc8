"""Fixed-buffer plan state for the batched TPU environment.

The reference mutates a growing GeoDataFrame per step (reference:
urban_planning/envs/plan_client.py:623-652); here the plan lives in
preallocated slot tables with alive masks so `env.step` is a pure function of
arrays and the whole rollout compiles to ``vmap(lax.scan)``:

  * polygons:   (NP, KV, 2) vertex rings + count/type/alive + shape metrics
  * segments:   (NS, 2, 2) road/boundary segments + type/alive
  * points:     (NPT, 2) road intersections + alive
  * contiguity: (NE, 2) global-feature-index pairs + alive
    (global index: poly i -> i, seg j -> NP+j, point k -> NP+NS+k)

Initial states are built host-side from a scenario bundle, reusing the exact
host engine for the initial contiguity graph.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from urban_tpu import city_config
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.geometry.base import LINE, POINT, POLY


@struct.dataclass
class PlanState:
    # Coordinate buffers are STORED flat: TPU tiles are (8, 128), so a
    # trailing dimension of 2 would be lane-padded 2 -> 128 (64x memory) in
    # every carried copy of the state. The logical (…, 2) views are exposed
    # as properties.
    # polygons
    poly_ring_flat: jnp.ndarray  # (NP, KV*2) f32
    poly_nvert: jnp.ndarray     # (NP,) i32
    poly_type: jnp.ndarray      # (NP,) i32
    poly_alive: jnp.ndarray     # (NP,) bool
    poly_rect: jnp.ndarray      # (NP,) f32
    poly_eqi: jnp.ndarray       # (NP,) f32
    poly_sc: jnp.ndarray        # (NP,) f32
    # segments
    seg_flat: jnp.ndarray       # (NS, 4) f32
    seg_type: jnp.ndarray       # (NS,) i32
    seg_alive: jnp.ndarray      # (NS,) bool
    # points
    pt_flat: jnp.ndarray        # (NPT*2,) f32
    pt_alive: jnp.ndarray       # (NPT,) bool
    # cached per-polygon derived features, recomputed only for new parcels:
    # rows = [area, cx, cy, perimeter, minx, miny, maxx, maxy] (grid units)
    poly_feat: jnp.ndarray      # (8, NP) f32
    # contiguity edges
    edge: jnp.ndarray           # (NE, 2) i32 global feature indices
    edge_alive: jnp.ndarray     # (NE,) bool
    # feature-to-intersection incidence: I[f, p] = feature f touches point p.
    # Every feature contact in the snapped plan passes through a registered
    # intersection, so contiguity(A, B) == any(I[A] & I[B]) — an MXU matmul
    # instead of irregular pairwise geometry.
    incidence: jnp.ndarray      # (NF, NPT) bool
    # running stats (areas in m^2)
    plan_area: jnp.ndarray      # (NUM_TYPES,) f32
    plan_count: jnp.ndarray     # (NUM_TYPES,) i32
    # stage machine
    stage: jnp.ndarray          # () i32: 0 land_use, 1 road, 2 done
    land_use_steps: jnp.ndarray  # () i32
    road_steps: jnp.ndarray     # () i32
    total_road_steps: jnp.ndarray  # () i32
    done: jnp.ndarray           # () bool
    failure: jnp.ndarray        # () bool
    land_use_reward: jnp.ndarray  # () f32 cached at stage boundary

    @property
    def poly_ring(self) -> jnp.ndarray:
        s = self.poly_ring_flat.shape
        return self.poly_ring_flat.reshape(s[:-1] + (s[-1] // 2, 2))

    @property
    def seg(self) -> jnp.ndarray:
        s = self.seg_flat.shape
        return self.seg_flat.reshape(s[:-1] + (2, 2))

    @property
    def pt(self) -> jnp.ndarray:
        s = self.pt_flat.shape
        return self.pt_flat.reshape(s[:-1] + (s[-1] // 2, 2))


@dataclass(frozen=True)
class EnvSpec:
    """Static (compile-time) scenario + capacity configuration."""
    # capacities
    NP: int
    KV: int
    NS: int
    NPT: int
    NE: int
    max_num_nodes: int
    max_num_edges: int
    # community
    grid_cols: float
    grid_rows: float
    cell_edge_length: float
    community_area: float
    # objectives (tuples so the spec is hashable for jit closure)
    plan_order: Tuple[int, ...]
    required_plan_ratio: Tuple[float, ...]
    required_plan_count: Tuple[int, ...]
    required_max_area: Tuple[float, ...]
    required_min_area: Tuple[float, ...]
    required_max_edge_length: Tuple[float, ...]
    required_min_edge_length: Tuple[float, ...]
    common_max_area: float
    common_min_area: float
    common_max_edge_length: float
    common_min_edge_length: float
    rule_constraints: bool
    # stage config
    skip_land_use: bool
    skip_road: bool
    road_ratio: float
    # reward weights
    road_network_weight: float
    life_circle_weight: float
    greenness_weight: float
    concept_weight: float
    weight_by_area: bool
    # concepts: ((kind, cx, cy, ex, ey, distance, land_use_bitmask), ...)
    concepts: Tuple[Tuple[float, ...], ...] = ()
    # two-phase training: keep BOUNDARY segments at land-use completion
    # instead of converting them to roads (build_all_road). The reference
    # freezes the PRE-conversion snapshot for the road phase
    # (city.py:461-464 snapshot_land_use before transition_stage; the
    # conversion happens only in final-info enrichment, city.py:517), so a
    # phase-1 trainer must set this or its best plans carry no road
    # candidates for phase 2.
    keep_boundaries: bool = False

    @property
    def num_features(self) -> int:
        return self.NP + self.NS + self.NPT


def _default_caps(n_poly: int, n_seg: int, n_pt: int,
                  max_steps: int) -> Dict[str, int]:
    """Slot capacities: initial features plus worst-case growth.

    Each land-use step adds <= 1 parcel + 4 remaining pieces, <= 6 new
    intersections, and <= 2 splits + ring-edge boundaries."""
    def rup(x, m=64):
        return int(np.ceil(x / m) * m)
    return dict(
        NP=rup(n_poly + 5 * max_steps),
        NS=rup(n_seg + 10 * max_steps),
        NPT=rup(n_pt + 6 * max_steps),
    )


def build_env_spec(cfg, plc: PlanClient, max_steps: int = 60,
                   caps: Dict[str, int] | None = None,
                   keep_boundaries: bool = False) -> EnvSpec:
    """Derive the static spec from a Config + host PlanClient."""
    table = plc._init_table
    kinds = np.array([g.kind for g in table.geoms])
    n_poly = int((kinds == POLY).sum())
    n_seg = int((kinds == LINE).sum())
    n_pt = int((kinds == POINT).sum())
    c = _default_caps(n_poly, n_seg, n_pt, max_steps)
    if caps:
        c.update(caps)
    kv = caps.get('KV', 24) if caps else 24
    ne = caps.get('NE', cfg.state_encoder_specs['max_num_edges']) if caps \
        else cfg.state_encoder_specs['max_num_edges']

    concepts = []
    for concept in plc._concept:
        g = concept['geometry'].coords
        cx, cy = g[0]
        ex, ey = g[-1]
        kind = 0.0 if concept['type'] == 'center' else 1.0
        bitmask = 0
        for t in concept['land_use']:
            bitmask |= 1 << int(t)
        concepts.append((kind, float(cx), float(cy), float(ex), float(ey),
                         float(concept['distance']), float(bitmask)))

    return EnvSpec(
        NP=c['NP'], KV=kv, NS=c['NS'], NPT=c['NPT'], NE=ne,
        max_num_nodes=cfg.state_encoder_specs['max_num_nodes'],
        max_num_edges=cfg.state_encoder_specs['max_num_edges'],
        grid_cols=float(plc._grid_cols), grid_rows=float(plc._grid_rows),
        cell_edge_length=float(plc._cell_edge_length),
        community_area=float(plc._community_area),
        plan_order=tuple(int(x) for x in plc._plan_order),
        required_plan_ratio=tuple(float(x) for x in plc._required_plan_ratio),
        required_plan_count=tuple(int(x) for x in plc._required_plan_count),
        required_max_area=tuple(float(x) for x in plc._required_max_area),
        required_min_area=tuple(float(x) for x in plc._required_min_area),
        required_max_edge_length=tuple(
            float(x) for x in plc._required_max_edge_length),
        required_min_edge_length=tuple(
            float(x) for x in plc._required_min_edge_length),
        common_max_area=float(plc._common_max_area),
        common_min_area=float(plc._common_min_area),
        common_max_edge_length=float(plc._common_max_edge_length),
        common_min_edge_length=float(plc._common_min_edge_length),
        rule_constraints=bool(plc._rule_constraints),
        skip_land_use=bool(cfg.skip_land_use),
        skip_road=bool(cfg.skip_road),
        keep_boundaries=bool(keep_boundaries),
        road_ratio=float(cfg.road_ratio),
        road_network_weight=float(cfg.reward_specs.get('road_network_weight', 1.0)),
        life_circle_weight=float(cfg.reward_specs.get('life_circle_weight', 1.0)),
        greenness_weight=float(cfg.reward_specs.get('greenness_weight', 1.0)),
        concept_weight=float(cfg.reward_specs.get('concept_weight', 0.0)),
        weight_by_area=bool(cfg.reward_specs.get('weight_by_area', False)),
        concepts=tuple(concepts),
    )


def state_to_table(state: PlanState):
    """Host-side export of one env's slot state to the host engine's
    GeoTable — for scoring via CityEnv.load_plan/score_plan, best-plan
    checkpoint payloads, and the two-phase land-use freeze (reference
    snapshots the GeoDataFrame, plan_client.py:229-232)."""
    import numpy as np
    from urban_tpu.envs.plan_table import GeoTable
    from urban_tpu.geometry.base import Geometry, POINT, LINE, POLY

    poly_ring = np.asarray(state.poly_ring)
    poly_nvert = np.asarray(state.poly_nvert)
    poly_type = np.asarray(state.poly_type)
    poly_alive = np.asarray(state.poly_alive)
    rect = np.asarray(state.poly_rect)
    eqi = np.asarray(state.poly_eqi)
    sc = np.asarray(state.poly_sc)
    seg = np.asarray(state.seg)
    seg_type = np.asarray(state.seg_type)
    seg_alive = np.asarray(state.seg_alive)
    pt = np.asarray(state.pt)
    pt_alive = np.asarray(state.pt_alive)

    ids, types, geoms, rects, eqis, scs = [], [], [], [], [], []
    nid = 0
    # bounds come from the state's own buffers, not the spec: a PlanState
    # may be decoded under a spec with different capacities (e.g. a
    # two-phase phase-2 checkpoint opened with the base-scenario spec in
    # demo.py) and must still export every feature it holds
    NP_s, NS_s, NPT_s = (poly_alive.shape[0], seg_alive.shape[0],
                         pt_alive.shape[0])
    for i in range(NP_s):
        if not poly_alive[i]:
            continue
        ids.append(nid); nid += 1
        types.append(int(poly_type[i]))
        geoms.append(Geometry(POLY, poly_ring[i, :poly_nvert[i]].astype(
            np.float64)))
        rects.append(float(rect[i])); eqis.append(float(eqi[i]))
        scs.append(float(sc[i]))
    for j in range(NS_s):
        if not seg_alive[j]:
            continue
        ids.append(nid); nid += 1
        types.append(int(seg_type[j]))
        geoms.append(Geometry(LINE, seg[j].astype(np.float64)))
        rects.append(np.nan); eqis.append(np.nan); scs.append(np.nan)
    for k in range(NPT_s):
        if not pt_alive[k]:
            continue
        ids.append(nid); nid += 1
        types.append(int(city_config.INTERSECTION))
        geoms.append(Geometry(POINT, pt[k][None, :].astype(np.float64)))
        rects.append(np.nan); eqis.append(np.nan); scs.append(np.nan)
    return GeoTable(ids, types, [True] * len(ids), geoms,
                    rects, eqis, scs)


def build_initial_state(spec: EnvSpec, plc: PlanClient) -> PlanState:
    """Pack the scenario's initial plan into slot buffers (host side)."""
    table = plc._init_table
    NP, KV, NS, NPT, NE = spec.NP, spec.KV, spec.NS, spec.NPT, spec.NE

    poly_ring = np.zeros((NP, KV, 2), dtype=np.float32)
    poly_nvert = np.zeros(NP, dtype=np.int32)
    poly_type = np.zeros(NP, dtype=np.int32)
    poly_alive = np.zeros(NP, dtype=bool)
    poly_rect = np.full(NP, 0.5, dtype=np.float32)
    poly_eqi = np.full(NP, 0.5, dtype=np.float32)
    poly_sc = np.full(NP, 0.5, dtype=np.float32)
    seg = np.zeros((NS, 2, 2), dtype=np.float32)
    seg_type = np.zeros(NS, dtype=np.int32)
    seg_alive = np.zeros(NS, dtype=bool)
    pt = np.zeros((NPT, 2), dtype=np.float32)
    pt_alive = np.zeros(NPT, dtype=bool)

    row_to_slot = {}
    ip = is_ = ipt = 0
    for row in range(len(table)):
        if not table.existence[row]:
            continue
        g = table.geoms[row]
        if g.kind == POLY:
            ring = g.canonicalize().coords
            if len(ring) > KV:
                raise ValueError(f'Polygon with {len(ring)} verts exceeds '
                                 f'KV={KV}.')
            poly_ring[ip, :len(ring)] = ring
            poly_nvert[ip] = len(ring)
            poly_type[ip] = table.types[row]
            poly_alive[ip] = True
            if not np.isnan(table.rect[row]):
                poly_rect[ip] = table.rect[row]
                poly_eqi[ip] = table.eqi[row]
                poly_sc[ip] = table.sc[row]
            row_to_slot[row] = ip
            ip += 1
        elif g.kind == LINE:
            # multi-coord lines become one slot per sub-segment
            for i in range(len(g.coords) - 1):
                seg[is_] = g.coords[i:i + 2]
                seg_type[is_] = table.types[row]
                seg_alive[is_] = True
                if i == 0:
                    row_to_slot[row] = NP + is_
                is_ += 1
        else:
            pt[ipt] = g.coords[0]
            pt_alive[ipt] = True
            row_to_slot[row] = NP + NS + ipt
            ipt += 1
    if ip > NP or is_ > NS or ipt > NPT:
        raise ValueError('Initial plan exceeds slot capacities.')

    # feature-point incidence (exact host geometry)
    from urban_tpu.geometry import ops as gops
    from urban_tpu.geometry.base import Geometry, POINT as GPOINT
    incidence = np.zeros((spec.num_features, NPT), dtype=bool)
    pt_geoms = [(k, Geometry(GPOINT, pt[k][None, :]))
                for k in range(NPT) if pt_alive[k]]
    for row in range(len(table)):
        if not table.existence[row]:
            continue
        g = table.geoms[row]
        if g.kind == LINE:
            # multi-coord lines occupy several seg slots; per-sub-segment
            base = row_to_slot[row] - NP
            for i in range(len(g.coords) - 1):
                a, b = g.coords[i], g.coords[i + 1]
                for k, pg in pt_geoms:
                    p = pg.coords[0]
                    if gops.point_segment_distance(p, a[None], b[None])[0] \
                            <= 1e-6:
                        incidence[NP + base + i, k] = True
        else:
            slot = row_to_slot[row]
            for k, pg in pt_geoms:
                if gops.geometries_intersect(g, pg, tol=1e-6):
                    incidence[slot, k] = True
    for k in range(NPT):
        if pt_alive[k]:
            incidence[NP + NS + k, k] = True

    # initial contiguity from the host engine (exact oracle)
    plc.unplan_all_land_use()
    rows, edges = plc._get_current_gdf_and_graph()
    edge_arr = np.full((NE, 2), spec.num_features - 1, dtype=np.int32)
    edge_alive = np.zeros(NE, dtype=bool)
    k = 0
    for (i, j) in edges:
        ri, rj = int(rows[i]), int(rows[j])
        if ri in row_to_slot and rj in row_to_slot:
            if k >= NE:
                raise ValueError('Initial contiguity exceeds NE.')
            edge_arr[k] = (row_to_slot[ri], row_to_slot[rj])
            edge_alive[k] = True
            k += 1

    plan_area = np.array(plc._plan_area, dtype=np.float32)
    plan_count = np.array(plc._plan_count, dtype=np.int32)

    # cached polygon features
    poly_feat = np.zeros((8, NP), dtype=np.float32)
    for i in range(NP):
        if not poly_alive[i]:
            continue
        from urban_tpu.geometry.base import Geometry, POLY as GPOLY
        g = Geometry(GPOLY, poly_ring[i, :poly_nvert[i]])
        cx, cy = g.centroid
        x0, y0, x1, y1 = g.bounds
        poly_feat[:, i] = [g.area, cx, cy, g.perimeter, x0, y0, x1, y1]

    # road-only configs start in the road stage with the budget fixed at
    # reset (reference city.py:538-539)
    if spec.skip_land_use:
        from urban_tpu import city_config as cc
        n_boundary = int(((seg_type == cc.BOUNDARY) & seg_alive).sum())
        total_road_steps = int(np.floor(n_boundary * spec.road_ratio))
    else:
        total_road_steps = 0

    return PlanState(
        poly_ring_flat=jnp.asarray(poly_ring.reshape(NP, KV * 2)),
        poly_nvert=jnp.asarray(poly_nvert),
        poly_type=jnp.asarray(poly_type), poly_alive=jnp.asarray(poly_alive),
        poly_rect=jnp.asarray(poly_rect), poly_eqi=jnp.asarray(poly_eqi),
        poly_sc=jnp.asarray(poly_sc),
        seg_flat=jnp.asarray(seg.reshape(NS, 4)),
        seg_type=jnp.asarray(seg_type),
        seg_alive=jnp.asarray(seg_alive),
        pt_flat=jnp.asarray(pt.reshape(-1)), pt_alive=jnp.asarray(pt_alive),
        poly_feat=jnp.asarray(poly_feat),
        edge=jnp.asarray(edge_arr), edge_alive=jnp.asarray(edge_alive),
        incidence=jnp.asarray(incidence),
        plan_area=jnp.asarray(plan_area), plan_count=jnp.asarray(plan_count),
        stage=jnp.asarray(1 if spec.skip_land_use else 0, dtype=jnp.int32),
        land_use_steps=jnp.asarray(0, dtype=jnp.int32),
        road_steps=jnp.asarray(0, dtype=jnp.int32),
        total_road_steps=jnp.asarray(total_road_steps, dtype=jnp.int32),
        done=jnp.asarray(False),
        failure=jnp.asarray(False),
        land_use_reward=jnp.asarray(-1.0, dtype=jnp.float32),
    )
