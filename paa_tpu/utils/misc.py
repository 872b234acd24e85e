"""Small cross-cutting utilities.

TPU-native stand-ins for the reference's utils/{miscellaneous,collect_env,
model_zoo,cv2_util}.py: directory/config helpers, an environment dump for
the startup log (JAX/device info instead of torch/CUDA), a local weight
cache resolver for http(s) WEIGHT urls (no egress in this environment —
resolution is cache-only), and a version-portable cv2 findContours.
"""

from __future__ import annotations

import os


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def save_config(cfg, path):
    """Persist the merged config next to the run's outputs
    (reference train_net.py:172-175 output_config_path)."""
    with open(path, "w") as f:
        f.write(cfg.dump())


def collect_env_info() -> str:
    """Environment dump for the startup log: the reference prints
    torch/CUDA build info (utils/collect_env.py); here the relevant
    stack is python/jax/XLA backend/devices."""
    import platform
    import sys

    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            lines.append(f"backend: {jax.default_backend()}")
            lines.append(
                "devices: "
                + ", ".join(str(d) for d in jax.devices())
            )
        except Exception as e:  # no device plugin / tunnel down
            lines.append(f"devices: unavailable ({e})")
    except ImportError:
        lines.append("jax: not installed")
    try:
        import flax

        lines.append(f"flax: {flax.__version__}")
    except ImportError:
        pass
    try:
        import numpy

        lines.append(f"numpy: {numpy.__version__}")
    except ImportError:
        pass
    return "\n".join(lines)


def cache_url(url: str, model_dir: str | None = None) -> str:
    """Resolve an http(s) WEIGHT url to a local cached file
    (reference utils/model_zoo.py cache_url semantics: the URL fragment
    or basename names the file; Detectron's shared 'model_final.pkl'
    basenames are disambiguated by the full path).

    This environment has no network egress, so the file must already be
    in the cache dir ($PAA_TPU_WEIGHTS_DIR or ~/.torch/models); a
    missing entry raises with the expected path so the user can place
    it there.
    """
    from urllib.parse import urlparse

    if model_dir is None:
        model_dir = os.environ.get(
            "PAA_TPU_WEIGHTS_DIR",
            os.path.join(
                os.path.expanduser(os.getenv("TORCH_HOME", "~/.torch")),
                "models",
            ),
        )
    parts = urlparse(url)
    filename = parts.fragment or os.path.basename(parts.path)
    if filename == "model_final.pkl":
        filename = parts.path.replace("/", "_")
    cached = os.path.join(model_dir, filename)
    if not os.path.exists(cached):
        raise FileNotFoundError(
            f"weight url {url} is not cached; place the file at {cached} "
            f"(no network egress in this environment)"
        )
    return cached


def find_contours(mask):
    """cv2.findContours across cv2 versions (reference utils/cv2_util.py):
    OpenCV 4 returns (contours, hierarchy), OpenCV 3 returned
    (image, contours, hierarchy)."""
    import cv2

    out = cv2.findContours(
        mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if len(out) == 3:
        return out[1], out[2]
    return out
