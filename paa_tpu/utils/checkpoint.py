"""Checkpointing with orbax + the reference's pointer-file semantics.

Mirrors paa_core/utils/checkpoint.py:13-141: ``save(name, **extra)``
writes model+optimizer+iteration under OUTPUT_DIR; a ``last_checkpoint``
tag file records the most recent save; ``load()`` with no argument
resumes from the tag file, otherwise loads the given path (or the
``catalog://`` indirection resolved via ModelCatalog for ImageNet
weights, handled by the torch-weight importer)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class Checkpointer:
    def __init__(self, save_dir="", save_to_disk=True, logger=None):
        self.save_dir = save_dir
        self.save_to_disk = save_to_disk
        self.logger = logger

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)

    def save(self, name: str, state_tree: Any, **extra):
        if not (self.save_dir and self.save_to_disk):
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.save_dir, name))
        self._log(f"Saving checkpoint to {path}")
        data = {"state": state_tree, "extra": dict(extra)}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, data, force=True)
        ckptr.wait_until_finished()
        self.tag_last_checkpoint(name)

    def has_checkpoint(self):
        return os.path.exists(
            os.path.join(self.save_dir, "last_checkpoint")
        )

    def get_checkpoint_file(self):
        try:
            with open(
                os.path.join(self.save_dir, "last_checkpoint")
            ) as f:
                return f.read().strip()
        except OSError:
            return ""

    def tag_last_checkpoint(self, name):
        with open(
            os.path.join(self.save_dir, "last_checkpoint"), "w"
        ) as f:
            f.write(name)

    def load(self, path: Optional[str], template: Any):
        """Restore a checkpoint into the structure of ``template``.

        Returns (state_tree, extra) or (None, {}) if nothing to load.
        """
        if not path:
            if self.has_checkpoint():
                path = os.path.join(
                    self.save_dir, self.get_checkpoint_file()
                )
            else:
                self._log(
                    "No checkpoint found. Initializing model from scratch"
                )
                return None, {}
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        self._log(f"Loading checkpoint from {path}")
        ckptr = ocp.StandardCheckpointer()
        data = ckptr.restore(
            path, {"state": template, "extra": {"iteration": 0}}
        )
        return data["state"], data["extra"]
