#!/usr/bin/env python
"""Plot a diagnostics bag — the reference's `plot_lci.py` workflow for the
.npz bags this framework records (utils/bag.py).

Renders the reference's four panel groups (reference:
src/legged_ctrl/scripts/plot_lci.py:22-105):
  1. odometry vs desired        (x/y/z, actual + commanded + estimated)
  2. euler angles vs desired    (roll/pitch/yaw + desired)
  3. foot forces                (z/x/y per leg, planned GRFs + tau-estimate)
  4. foot position tracking     (per-leg world position vs swing target)
plus the contact timeline (plan vs sim contact flags).

Usage:
    python tools/plot_bag.py BAG.npz [--dt 0.01] [--out PREFIX]

With --out, writes PREFIX_odom.png / _euler.png / _forces.png / _feet.png /
_contacts.png (headless-safe); without it, opens interactive windows.
Record a bag with `python -m legged_mpc_control_tpu --bag BAG.npz ...`
(utils/bag.save_bag on any rollout's diag pytree works too)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

LEGS = ["FL", "FR", "RL", "RR"]


def _time(bag, dt):
    n = next(iter(bag.values())).shape[0]
    return np.arange(n) * dt


def plot_odom(bag, t, axes):
    pos = bag["root_pos"]
    axes[0].set_title("position and desired position")
    for k, name in enumerate("xyz"):
        axes[k].plot(t, pos[:, k], label=name)
        if "root_pos_d" in bag:
            axes[k].plot(t, bag["root_pos_d"][:, k], "--",
                         label=f"{name}_d")
        if "root_pos_est" in bag:
            axes[k].plot(t, bag["root_pos_est"][:, k], ":",
                         label=f"{name}_est")
        axes[k].legend(loc="upper right")
        axes[k].set_ylabel("m")
    axes[-1].set_xlabel("t [s]")


def _quat_to_euler(q):
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.stack([roll, pitch, yaw], axis=1)


def plot_euler(bag, t, axes):
    eul = _quat_to_euler(bag["root_quat"])
    axes[0].set_title("euler angles")
    for k, name in enumerate(("roll", "pitch", "yaw")):
        axes[k].plot(t, eul[:, k], label=name)
        if "root_euler_d" in bag:
            axes[k].plot(t, bag["root_euler_d"][:, k], "--",
                         label=f"{name}_d")
        axes[k].legend(loc="upper right")
        axes[k].set_ylabel("rad")
    axes[-1].set_xlabel("t [s]")


def plot_forces(bag, t, axes):
    grf = bag["grf"].reshape(len(t), 4, 3)
    est = bag.get("foot_force_tau_est")
    axes[0].set_title("foot forces (planned GRF; dotted = tau estimate)")
    for k, ax_name in ((0, "z"), (1, "x"), (2, "y")):
        comp = {"z": 2, "x": 0, "y": 1}[ax_name]
        for leg in range(4):
            axes[k].plot(t, grf[:, leg, comp],
                         label=f"{LEGS[leg]}_{ax_name}")
            if est is not None:
                axes[k].plot(t, est[:, leg, comp], ":", alpha=0.6)
        axes[k].legend(loc="upper right", ncol=4, fontsize=7)
        axes[k].set_ylabel("N")
    axes[-1].set_xlabel("t [s]")


def plot_feet(bag, t, axes):
    fp = bag["foot_pos_world"]
    tgt = bag.get("foot_pos_target_world")
    axes[0].set_title("foot positions (world; dashed = target)")
    for leg in range(4):
        for k, name in enumerate("xyz"):
            axes[leg].plot(t, fp[:, leg, k], label=f"{name}")
            if tgt is not None:
                axes[leg].plot(t, tgt[:, leg, k], "--", alpha=0.7)
        axes[leg].set_ylabel(LEGS[leg])
        if leg == 0:
            axes[leg].legend(loc="upper right", ncol=3, fontsize=7)
    axes[-1].set_xlabel("t [s]")


def plot_contacts(bag, t, ax):
    ax.set_title("contacts (solid = sim, dashed = plan)")
    for leg in range(4):
        off = 1.5 * leg
        if "sim_contacts" in bag:
            ax.step(t, bag["sim_contacts"][:, leg] + off,
                    where="post", label=LEGS[leg])
        if "plan_contacts" in bag:
            ax.step(t, bag["plan_contacts"][:, leg] + off, "--",
                    where="post", alpha=0.6)
    ax.set_yticks([1.5 * k + 0.5 for k in range(4)], LEGS)
    ax.set_xlabel("t [s]")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bag")
    ap.add_argument("--dt", type=float, default=None,
                    help="tick period (defaults to bag meta, else 0.01)")
    ap.add_argument("--out", default=None,
                    help="write PREFIX_{odom,euler,forces,feet,contacts}"
                         ".png instead of showing windows")
    args = ap.parse_args()

    import matplotlib
    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from legged_mpc_control_tpu.utils.bag import load_bag

    bag, meta = load_bag(args.bag)
    dt = args.dt or float(meta.get("dt", 0.01))
    t = _time(bag, dt)

    panels = []
    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    plot_odom(bag, t, axes)
    panels.append((fig, "odom"))
    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    plot_euler(bag, t, axes)
    panels.append((fig, "euler"))
    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    plot_forces(bag, t, axes)
    panels.append((fig, "forces"))
    fig, axes = plt.subplots(4, 1, figsize=(9, 8), sharex=True)
    plot_feet(bag, t, axes)
    panels.append((fig, "feet"))
    fig, ax = plt.subplots(figsize=(9, 3.5))
    plot_contacts(bag, t, ax)
    panels.append((fig, "contacts"))

    if args.out:
        for fig, name in panels:
            fig.tight_layout()
            path = f"{args.out}_{name}.png"
            fig.savefig(path, dpi=120)
            print("wrote", path)
    else:
        plt.show()


if __name__ == "__main__":
    main()
