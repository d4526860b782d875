"""Per-frame learnable latent codes for dynamic try-on (BASELINE.json:11).

An embedding table indexed by frame id; the looked-up code joins the field's
conditioning input so one set of MLP weights renders a rotating-subject video
with per-frame appearance.
"""

from __future__ import annotations

import flax.linen as nn


class LatentTable(nn.Module):
    n_frames: int
    dim: int

    @nn.compact
    def __call__(self, frame_ids):
        """frame_ids: (R,) int32 → (R, dim) latent codes."""
        table = nn.Embed(self.n_frames, self.dim, name="codes")
        return table(frame_ids)
