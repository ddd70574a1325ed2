"""Validation plotting (reference `train_bisinger/utils/plot.py`): mel
heatmaps, GT-vs-pred mel comparison, f0 curves, duration alignments.
Returns matplotlib figures for the TensorBoard logger."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def spec_to_figure(spec: np.ndarray, vmin: float = -6, vmax: float = 1.5):
    fig = plt.figure(figsize=(12, 6))
    plt.pcolor(np.asarray(spec).T, vmin=vmin, vmax=vmax)
    plt.colorbar()
    plt.xlabel("frame")
    plt.ylabel("mel bin")
    return fig


def spec_compare_figure(
    spec_gt: np.ndarray, spec_pred: np.ndarray, vmin: float = -6, vmax: float = 1.5
):
    fig, axes = plt.subplots(2, 1, figsize=(12, 8), sharex=True)
    for ax, spec, title in zip(axes, (spec_gt, spec_pred), ("GT", "pred")):
        im = ax.pcolor(np.asarray(spec).T, vmin=vmin, vmax=vmax)
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    return fig


def f0_to_figure(
    f0_gt: np.ndarray,
    f0_cwt: Optional[np.ndarray] = None,
    f0_pred: Optional[np.ndarray] = None,
):
    fig = plt.figure()
    plt.plot(np.asarray(f0_gt), color="r", label="gt")
    if f0_cwt is not None:
        plt.plot(np.asarray(f0_cwt), color="b", label="cwt")
    if f0_pred is not None:
        plt.plot(np.asarray(f0_pred), color="green", label="pred")
    plt.legend()
    return fig


def dur_to_figure(dur_gt: np.ndarray, dur_pred: np.ndarray, txt: Optional[str] = None):
    fig = plt.figure()
    dur_gt = np.cumsum(np.asarray(dur_gt, dtype=np.float64))
    dur_pred = np.cumsum(np.asarray(dur_pred, dtype=np.float64))
    for i in range(len(dur_gt)):
        plt.axvline(dur_gt[i], color="r", alpha=0.5)
        plt.axvline(dur_pred[i], color="b", alpha=0.5)
    plt.title("red: GT boundaries, blue: predicted")
    return fig
