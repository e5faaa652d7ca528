"""MedFuse-parity preprocessing: Discretizer, Normalizer, pairing modes.

Parity targets (reference MedFuse_Preprocessing/):
  * Discretizer — ehr_utils/preprocessing.py:11-177: time-binning of
    irregular EHR rows with per-channel one-hot expansion for categorical
    channels, impute strategies zero/normal_value/previous/next, and an
    appended per-channel observation-mask block. Bin rule
    bin = int(t/timestep - eps); later values overwrite earlier in-bin ones.
  * Normalizer — ehr_utils/preprocessing.py:180-231: streaming mean/std
    (Bessel-corrected) with JSON persistence (the reference pickles).
  * Pairing — datasets/fusion.py:39-99 (MIMIC_CXR_EHR): paired_ehr_cxr /
    paired_ehr / radiology / partial_ehr / partial_ehr_cxr with data_ratio
    resampling of unpaired stays (ratio forced to 1.0 on test, 0.0 on val).

The discretizer is vectorized over rows; the per-stay output feeds the
76-feature structured channel grid of the flagship (F = continuous + one-hot
+ mask columns).
"""
from __future__ import annotations

import json
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

EPS = 1e-6

#: default 17-channel config (continuous channels; categorical GCS channels
#: carry MedFuse-style possible values)
DEFAULT_CHANNELS: Dict[str, dict] = {
    "id_to_channel": [
        "Capillary refill rate", "Diastolic blood pressure",
        "Fraction inspired oxygen", "Glascow coma scale eye opening",
        "Glascow coma scale motor response", "Glascow coma scale total",
        "Glascow coma scale verbal response", "Glucose", "Heart Rate",
        "Height", "Mean blood pressure", "Oxygen saturation",
        "Respiratory rate", "Systolic blood pressure", "Temperature",
        "Weight", "pH",
    ],
    "is_categorical_channel": {
        "Capillary refill rate": True,
        "Glascow coma scale eye opening": True,
        "Glascow coma scale motor response": True,
        "Glascow coma scale total": True,
        "Glascow coma scale verbal response": True,
    },
    "possible_values": {
        "Capillary refill rate": ["0.0", "1.0"],
        "Glascow coma scale eye opening": ["1", "2", "3", "4"],
        "Glascow coma scale motor response": ["1", "2", "3", "4", "5", "6"],
        "Glascow coma scale total": [str(v) for v in range(3, 16)],
        "Glascow coma scale verbal response": ["1", "2", "3", "4", "5"],
    },
    "normal_values": {
        "Capillary refill rate": "0.0",
        "Diastolic blood pressure": "59.0",
        "Fraction inspired oxygen": "0.21",
        "Glascow coma scale eye opening": "4",
        "Glascow coma scale motor response": "6",
        "Glascow coma scale total": "15",
        "Glascow coma scale verbal response": "5",
        "Glucose": "128.0",
        "Heart Rate": "86",
        "Height": "170.0",
        "Mean blood pressure": "77.0",
        "Oxygen saturation": "98.0",
        "Respiratory rate": "19",
        "Systolic blood pressure": "118.0",
        "Temperature": "36.6",
        "Weight": "81.0",
        "pH": "7.4",
    },
}


class Discretizer:
    def __init__(
        self,
        timestep: float = 0.8,
        store_masks: bool = True,
        impute_strategy: str = "zero",
        start_time: str = "zero",
        config: Optional[dict] = None,
        config_path: Optional[str] = None,
    ):
        if config is None:
            if config_path:
                with open(config_path) as f:
                    config = json.load(f)
            else:
                config = DEFAULT_CHANNELS
        self._id_to_channel: List[str] = config["id_to_channel"]
        self._channel_to_id = {c: i for i, c in enumerate(self._id_to_channel)}
        self._is_categorical = {
            c: bool(config.get("is_categorical_channel", {}).get(c, False))
            for c in self._id_to_channel
        }
        self._possible_values = config.get("possible_values", {})
        self._normal_values = config.get("normal_values", {})
        self._timestep = timestep
        self._store_masks = store_masks
        self._impute = impute_strategy
        self._start_time = start_time
        if impute_strategy not in ("zero", "normal_value", "previous", "next"):
            raise ValueError(f"invalid impute strategy {impute_strategy!r}")
        if start_time not in ("zero", "relative"):
            raise ValueError(f"invalid start_time {start_time!r}")

        # column layout
        self._begin_pos: List[int] = []
        cur = 0
        for c in self._id_to_channel:
            self._begin_pos.append(cur)
            cur += len(self._possible_values[c]) if self._is_categorical[c] else 1
        self._cont_width = cur

    @property
    def output_header(self) -> List[str]:
        header = []
        for c in self._id_to_channel:
            if self._is_categorical[c]:
                header += [f"{c}->{v}" for v in self._possible_values[c]]
            else:
                header.append(c)
        if self._store_masks:
            header += [f"mask->{c}" for c in self._id_to_channel]
        return header

    def _write(self, data: np.ndarray, bin_id: int, channel: str, value: str):
        cid = self._channel_to_id[channel]
        pos = self._begin_pos[cid]
        if self._is_categorical[channel]:
            one_hot = np.zeros(len(self._possible_values[channel]))
            one_hot[self._possible_values[channel].index(str(value))] = 1.0
            data[bin_id, pos : pos + len(one_hot)] = one_hot
        else:
            data[bin_id, pos] = float(value)

    def transform(
        self, rows: Sequence[Sequence[str]], header: Optional[Sequence[str]] = None,
        end: Optional[float] = None,
    ) -> Tuple[np.ndarray, List[str]]:
        """rows: [[hours, ch1, ch2, ...], ...] sorted by hours; '' = missing."""
        if header is None:
            header = ["Hours"] + self._id_to_channel
        assert header[0] == "Hours"
        ts = [float(r[0]) for r in rows]
        first = ts[0] if (self._start_time == "relative" and ts) else 0.0
        max_hours = (end if end is not None else (max(ts) if ts else 0.0)) - first
        n_bins = int(max_hours / self._timestep + 1.0 - EPS)
        n_ch = len(self._id_to_channel)

        data = np.zeros((n_bins, self._cont_width))
        mask = np.zeros((n_bins, n_ch), dtype=int)
        original: List[List[str]] = [["" for _ in range(n_ch)] for _ in range(n_bins)]

        for row in rows:
            t = float(row[0]) - first
            if t > max_hours + EPS:
                continue
            bin_id = int(t / self._timestep - EPS)
            for j in range(1, len(row)):
                if row[j] == "":
                    continue
                channel = header[j]
                cid = self._channel_to_id[channel]
                mask[bin_id][cid] = 1
                self._write(data, bin_id, channel, row[j])
                original[bin_id][cid] = row[j]

        if self._impute in ("normal_value", "previous"):
            prev: List[List[str]] = [[] for _ in range(n_ch)]
            for b in range(n_bins):
                for channel in self._id_to_channel:
                    cid = self._channel_to_id[channel]
                    if mask[b][cid] == 1:
                        prev[cid].append(original[b][cid])
                        continue
                    if self._impute == "normal_value" or not prev[cid]:
                        value = self._normal_values[channel]
                    else:
                        value = prev[cid][-1]
                    self._write(data, b, channel, value)
        elif self._impute == "next":
            nxt: List[List[str]] = [[] for _ in range(n_ch)]
            for b in range(n_bins - 1, -1, -1):
                for channel in self._id_to_channel:
                    cid = self._channel_to_id[channel]
                    if mask[b][cid] == 1:
                        nxt[cid].append(original[b][cid])
                        continue
                    value = nxt[cid][-1] if nxt[cid] else self._normal_values[channel]
                    self._write(data, b, channel, value)

        if self._store_masks:
            data = np.hstack([data, mask.astype(np.float32)])
        return data.astype(np.float32), self.output_header


class Normalizer:
    """Streaming mean/std normalizer with JSON persistence."""

    def __init__(self, fields: Optional[Sequence[int]] = None):
        self._fields = list(fields) if fields is not None else None
        self._sum = None
        self._sum_sq = None
        self._count = 0
        self.means = None
        self.stds = None

    def feed(self, x: np.ndarray):
        x = np.asarray(x, np.float64)
        self._count += x.shape[0]
        if self._sum is None:
            self._sum = x.sum(axis=0)
            self._sum_sq = (x**2).sum(axis=0)
        else:
            self._sum += x.sum(axis=0)
            self._sum_sq += (x**2).sum(axis=0)

    def finalize(self):
        eps = 1e-7
        n = self._count
        self.means = self._sum / n
        var = (self._sum_sq - 2.0 * self._sum * self.means + n * self.means**2) / (n - 1)
        self.stds = np.sqrt(np.maximum(var, 0.0))
        self.stds[self.stds < eps] = eps
        return self

    def save(self, path: str):
        if self.means is None:
            self.finalize()
        with open(path, "w") as f:
            json.dump({"means": self.means.tolist(), "stds": self.stds.tolist()}, f)

    def load(self, path: str):
        with open(path) as f:
            d = json.load(f)
        self.means = np.asarray(d["means"])
        self.stds = np.asarray(d["stds"])
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        out = np.array(x, dtype=np.float64)
        cols = self._fields if self._fields is not None else range(x.shape[1])
        for c in cols:
            out[:, c] = (x[:, c] - self.means[c]) / self.stds[c]
        return out.astype(np.float32)


@dataclass
class PairingConfig:
    data_pairs: str = "paired_ehr_cxr"
    data_ratio: float = 1.0
    split: str = "train"
    seed: int = 0


def build_pairing_index(
    ehr_stays: Sequence[str],
    paired_stays: Sequence[str],
    paired_dicoms: Sequence[str],
    cfg: PairingConfig,
) -> List[Tuple[Optional[str], Optional[str]]]:
    """Materialize the (stay, dicom) sample list for a pairing mode.

    Mirrors MIMIC_CXR_EHR.__len__/__getitem__: val forces ratio 0.0, test
    forces 1.0; partial_ehr_cxr appends ratio * |unpaired| EHR-only samples
    drawn at random.
    """
    ratio = cfg.data_ratio
    if cfg.split == "test":
        ratio = 1.0
    elif cfg.split == "val":
        ratio = 0.0

    paired = list(zip(paired_stays, paired_dicoms))
    unpaired = sorted(set(ehr_stays) - set(paired_stays))
    mode = cfg.data_pairs
    if mode == "paired_ehr_cxr":
        return [(s, d) for s, d in paired]
    if mode == "paired_ehr":
        return [(s, None) for s, _ in paired]
    if mode == "radiology":
        return [(None, d) for _, d in paired]
    if mode == "partial_ehr":
        return [(s, None) for s in ehr_stays]
    if mode == "partial_ehr_cxr":
        rng = random.Random(cfg.seed)
        out: List[Tuple[Optional[str], Optional[str]]] = [(s, d) for s, d in paired]
        n_extra = int(ratio * len(unpaired))
        for _ in range(n_extra):
            out.append((unpaired[rng.randint(0, len(unpaired) - 1)], None))
        return out
    raise ValueError(f"Unknown data_pairs mode {mode!r}")
