"""Options system: nested dataclasses ⇄ YAML with per-key defaulting.

Parity target: the reference's options stack (`all_options.h:35-156`,
`options_parser.cpp:12-369` get_or_default pattern, `options_writer.cpp`
effective-config emit-back, `options_printer.cpp`). The YAML schema follows
`zenslam_options/options/tumvi.yaml` (folder/slam/detection/tracking/
triangulation/keyframe/lba/pnp/essential/rigid sections) so a reference
user's config carries over with renamed backends only.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

from zenslam_tpu.pipeline.state import SlamConfig
from zenslam_tpu.pipeline.system import BackendConfig


@dataclass
class FolderOptions:
    root: str = ""
    left: str = "cam0/data"
    right: str = "cam1/data"
    output: str = "./output"
    calibration_file: str = ""
    imu_calibration_file: str = ""
    imu_file: str = "imu0/data.csv"
    groundtruth_file: str = ""
    timescale: float = 1e-9
    skip_frames: int = 0
    take_frames: int = 0


@dataclass
class AllOptions:
    log_level: str = "info"
    folder: FolderOptions = field(default_factory=FolderOptions)
    slam: SlamConfig = field(default_factory=SlamConfig)
    backend: BackendConfig = field(default_factory=BackendConfig)


def _from_dict(cls, d: dict):
    """Per-key defaulting: unknown keys ignored, missing keys defaulted
    (≡ options_parser get_or_default)."""
    if dataclasses.is_dataclass(cls):
        names = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in (d or {}).items():
            if k in names:
                f = names[k]
                sub = f.type if isinstance(f.type, type) else None
                if dataclasses.is_dataclass(f.default_factory() if f.default_factory is not dataclasses.MISSING else None):
                    kwargs[k] = _from_dict(type(f.default_factory()), v)
                else:
                    kwargs[k] = v
        return cls(**kwargs)
    return cls(**(d or {}))


def load_options(path: str) -> AllOptions:
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f) or {}
    opts = AllOptions()
    if "folder" in d:
        opts.folder = _from_dict(FolderOptions, d["folder"])
    if "slam" in d:
        # SlamConfig is a NamedTuple: filter to known fields
        known = SlamConfig._fields
        opts.slam = SlamConfig(**{k: v for k, v in d["slam"].items() if k in known})
    if "backend" in d:
        opts.backend = _from_dict(BackendConfig, d["backend"])
    if "log_level" in d:
        opts.log_level = d["log_level"]
    return opts


def save_options(opts: AllOptions, path: str) -> None:
    """Emit the EFFECTIVE config back to YAML (≡ options_writer.cpp — the
    reference writes the resolved options on exit)."""
    import yaml

    d = {
        "log_level": opts.log_level,
        "folder": dataclasses.asdict(opts.folder),
        "slam": dict(opts.slam._asdict()),
        "backend": dataclasses.asdict(opts.backend),
    }
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
