"""Per-frame trajectory: poses relative to continuously re-optimized
reference keyframes.

Replaces src/core/Trajectory.{h,cc}: every tracked frame stores
Tcr = Tcw @ Tref_wc (pose relative to its reference KF) so that when BA
re-optimizes keyframes, all frame poses re-derive by one batched gather +
matmul (`update`, Trajectory.cc:98,152). Time interpolation (`poseAtTime`,
Trajectory.cc:195) and velocity integration (`integrateVelocity`,
Trajectory.cc:231) become vectorized searchsorted + SE3 geodesic
interpolation — these drive the dual-camera imaging placement.

Fixed-capacity arena [T]; append is a cursor write.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hyslam_tpu.geometry import se3


class Trajectory(NamedTuple):
    t: jnp.ndarray         # [T] timestamps
    Tcr: jnp.ndarray       # [T, 4, 4] frame pose relative to ref KF
    ref_kf: jnp.ndarray    # [T] reference keyframe id
    Tcw: jnp.ndarray       # [T, 4, 4] cached absolute pose (refreshed)
    vel: jnp.ndarray       # [T, 6] tangent velocity (per second)
    dt: jnp.ndarray        # [T] time since previous element
    good: jnp.ndarray      # [T] tracking succeeded
    valid: jnp.ndarray     # [T]
    size: jnp.ndarray      # [] cursor

    @property
    def capacity(self):
        return self.t.shape[0]


def empty_trajectory(T: int = 8192) -> Trajectory:
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (T, 1, 1))
    return Trajectory(
        t=jnp.zeros((T,), jnp.float32),
        Tcr=eye,
        ref_kf=jnp.full((T,), -1, jnp.int32),
        Tcw=eye,
        vel=jnp.zeros((T, 6), jnp.float32),
        dt=jnp.zeros((T,), jnp.float32),
        good=jnp.zeros((T,), bool),
        valid=jnp.zeros((T,), bool),
        size=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def append(
    traj: Trajectory,
    timestamp,
    Tcw: jnp.ndarray,
    ref_kf,
    ref_Tcw: jnp.ndarray,
    good,
    commit=True,
) -> Trajectory:
    """Append one frame (Trajectory::push_back, Trajectory.cc:98): stores
    Tcr = Tcw @ ref_Tcw^-1 and the velocity vs the previous element.

    `commit` (traced bool) gates the cursor advance: with commit=False the
    slot is scribbled but `size` stays, so the next successful append
    overwrites it — the device-resident analog of "no trajectory entry for
    a lost frame" used by the async tracking step (every consumer masks by
    the cursor)."""
    i = traj.size
    prev = jnp.clip(i - 1, 0, traj.capacity - 1)
    has_prev = i > 0
    dt = jnp.where(has_prev, timestamp - traj.t[prev], 0.0)
    rel = Tcw @ se3.inverse(traj.Tcw[prev])
    v = jnp.where(
        has_prev & (dt > 1e-6), se3.log(rel) / jnp.maximum(dt, 1e-6), jnp.zeros(6)
    )
    Tcr = Tcw @ se3.inverse(ref_Tcw)
    return traj._replace(
        t=traj.t.at[i].set(timestamp),
        Tcr=traj.Tcr.at[i].set(Tcr),
        ref_kf=traj.ref_kf.at[i].set(ref_kf),
        Tcw=traj.Tcw.at[i].set(Tcw),
        vel=traj.vel.at[i].set(v),
        dt=traj.dt.at[i].set(dt),
        good=traj.good.at[i].set(good),
        valid=traj.valid.at[i].set(jnp.asarray(commit, bool)),
        size=i + jnp.asarray(commit, jnp.int32),
    )


@jax.jit
def refresh(traj: Trajectory, kf_Tcw: jnp.ndarray, kf_bad: jnp.ndarray,
            kf_span_parent: jnp.ndarray,
            kf_Tcp: jnp.ndarray | None = None) -> Trajectory:
    """Re-derive all absolute poses from (possibly re-optimized) keyframes:
    Tcw[i] = Tcr[i] @ kf_Tcw[ref]  (Trajectory::update). If a reference KF
    went bad, walk up the spanning tree to a live ancestor, composing the
    culled KF's frozen relative pose kf_Tcp into Tcr at each hop — a bad
    KF's own Tcw is no longer optimized, so using it directly (or skipping
    the composition) re-anchors the frame against a stale/incoherent pose
    (the reference's Trw = Trw * mTcp walk, Trajectory.cc:152)."""
    K = kf_Tcw.shape[0]
    if kf_Tcp is None:
        kf_Tcp = jnp.broadcast_to(jnp.eye(4, dtype=kf_Tcw.dtype),
                                  kf_Tcw.shape)

    def live_ref(carry, _):
        r, T = carry
        rc = jnp.clip(r, 0, K - 1)
        hop = (r >= 0) & kf_bad[rc]
        T2 = jnp.where(hop[:, None, None], T @ kf_Tcp[rc], T)
        r2 = jnp.where(hop, kf_span_parent[rc], r)
        return (r2, T2), None

    # walk bound = K: a bad-ancestor chain can be arbitrarily long under
    # aggressive keyframe culling (measured: 8 hops left frames anchored on
    # stale culled poses after a loop correction — ~1 m spikes in an
    # otherwise corrected trajectory)
    (ref, Tcr_eff), _ = jax.lax.scan(
        live_ref, (traj.ref_kf, traj.Tcr), None, length=K)
    refc = jnp.clip(ref, 0, K - 1)
    new_Tcw = Tcr_eff @ kf_Tcw[refc]
    # a ref still bad after K hops has no live ancestor: keep the old pose
    ok = traj.valid & (ref >= 0) & ~kf_bad[refc]
    return traj._replace(Tcw=jnp.where(ok[:, None, None], new_Tcw, traj.Tcw))


@jax.jit
def pose_at_time(traj: Trajectory, query_t: jnp.ndarray):
    """SE3-interpolated pose(s) at query times [Q] (Trajectory::poseAtTime).
    Clamps outside the recorded range. Returns (Tcw [Q,4,4], ok [Q])."""
    n = traj.size
    tmax_idx = jnp.clip(n - 1, 0, traj.capacity - 1)
    times = jnp.where(
        jnp.arange(traj.capacity) < n, traj.t, traj.t[tmax_idx] + 1e6
    )
    hi = jnp.clip(jnp.searchsorted(times, query_t, side="left"), 0, tmax_idx)
    lo = jnp.clip(hi - 1, 0, tmax_idx)
    t0 = traj.t[lo]
    t1 = traj.t[hi]
    span = jnp.maximum(t1 - t0, 1e-9)
    alpha = jnp.clip((query_t - t0) / span, 0.0, 1.0)
    T = se3.interpolate(traj.Tcw[lo], traj.Tcw[hi], alpha)
    ok = (n > 0) & (query_t >= traj.t[0] - 0.5) & (query_t <= traj.t[tmax_idx] + 0.5)
    return T, ok


@jax.jit
def velocity_at_time(traj: Trajectory, query_t: jnp.ndarray):
    """Tangent velocity at query times (g2o::Trajectory::velocityAtTime)."""
    n = traj.size
    tmax_idx = jnp.clip(n - 1, 0, traj.capacity - 1)
    times = jnp.where(
        jnp.arange(traj.capacity) < n, traj.t, traj.t[tmax_idx] + 1e6
    )
    hi = jnp.clip(jnp.searchsorted(times, query_t, side="left"), 0, tmax_idx)
    return traj.vel[hi]


@jax.jit
def integrate_velocity(traj: Trajectory, t0: jnp.ndarray, t1: jnp.ndarray):
    """Integrated motion over [t0, t1] as an SE3 increment
    (Velocity::integrate / Trajectory::integrateVelocity): piecewise-constant
    velocity per recorded interval, accumulated with exact partial-interval
    weights at both ends."""
    cap = traj.capacity
    idx = jnp.arange(cap)
    seg_t0 = traj.t - traj.dt          # segment start
    seg_t1 = traj.t
    seg_ok = traj.valid & (idx < traj.size) & (traj.dt > 1e-9)
    ov0 = jnp.maximum(seg_t0, t0)
    ov1 = jnp.minimum(seg_t1, t1)
    w = jnp.clip(ov1 - ov0, 0.0, None) * seg_ok
    xi = jnp.sum(traj.vel * w[:, None], axis=0)
    return se3.exp(xi)


def predict_pose(traj: Trajectory, query_t: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity extrapolated pose at a (future) time — the motion
    model prior (TrackMotionModel.cpp:30-33 velocity scaling)."""
    n = traj.size
    last = jnp.clip(n - 1, 0, traj.capacity - 1)
    dt = query_t - traj.t[last]
    xi = traj.vel[last] * dt
    return se3.exp(xi) @ traj.Tcw[last]
