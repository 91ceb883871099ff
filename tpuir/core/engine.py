"""Batched, jit-compiled overlap-tiled inference engine.

This is the TPU-native redesign of the reference's per-patch Python loop
(/root/reference/src/utils.py:353-454). Behavioral contract kept identical:

  normalize -> KAIR tile grid -> (optional seeded AWGN per patch)
  -> pad-to-multiple + crop-back -> model forward -> (optional postprocess)
  -> Gaussian-window weighted accumulate -> divide by weight map
  -> restore input dtype.

TPU-first differences:
  * The tile grid yields patches of ONE uniform shape per image (edge tiles
    shift their origin back), so the whole grid is batched into a single
    (N, h, w, C) array and run through one compiled forward in fixed-size
    chunks. The compiled program's shape depends ONLY on
    (batch, patch_h, patch_w, C) — never on the image size — so a dataset
    with 50 distinct image sizes still compiles each model exactly once.
    Chunks are dispatched asynchronously and fetched at the end, so device
    compute overlaps host work and transfer latency.
  * The reference's per-call ``np.random.seed(0)`` means every patch gets
    the same noise field; it is synthesized once on the host (bit-exact
    MT19937, float64 add — the reference's arithmetic) and applied to the
    whole batch.
  * Patch gather and Gaussian blend-stitch run through the native C++ host
    library (native/tileblend.cpp) with a NumPy fallback; both reproduce
    the reference's float32 accumulate order bit-for-bit.
  * An optional ``compute_dtype`` (e.g. bfloat16) runs the model forward in
    reduced precision for serving; parity mode (None) pins true float32
    matmuls because XLA:TPU's default matmul precision is bf16 passes.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuir import native
from .degrade import add_noise_batched
from .image_io import normalize_image, restore_dtype
from .tiling import gaussian_window, tile_indices


def pad_to_multiple(x: jnp.ndarray, factor: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad NHWC bottom/right so H and W are multiples of ``factor``.

    mode='reflect' matches the Restormer/MaIR helper
    (/root/reference/src/utils.py:174-181); no-op when already divisible.
    """
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % factor
    pw = (-w) % factor
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)


def pad_always_block(x: jnp.ndarray, block: int = 32) -> jnp.ndarray:
    """DeblurGANv2 zero pad to the *next* multiple of ``block`` (always >=1
    block, even when divisible) — /root/reference/src/deblurganv2/__init__.py:16-25."""
    h, w = x.shape[1], x.shape[2]
    ph = (h // block + 1) * block - h
    pw = (w // block + 1) * block - w
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="constant")


@dataclasses.dataclass
class InferenceModel:
    """A model plus its engine hooks, as handed to the tiled engine.

    The reference dispatches per-family normalize/pad/postprocess hooks in
    ``get_model_prediction`` (/root/reference/src/utils.py:270-311); here the
    hooks are carried on the model bundle itself.
    """

    name: str
    apply_fn: Callable[[Any, jnp.ndarray], jnp.ndarray]  # (params, NHWC) -> NHWC
    params: Any
    patch_size: Optional[int] = None
    patch_overlap: int = 32
    pad_factor: Optional[int] = None  # reflect pad-to-multiple (Restormer/MaIR: 8)
    pad_block: Optional[int] = None  # always-pad zero block (DeblurGANv2: 32)
    normalize: Callable[[np.ndarray], np.ndarray] = staticmethod(normalize_image)
    postprocess: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    batch_size: int = 8
    param_count: int = 0
    device_pipeline: bool = True  # kept for API compat; both paths identical now
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16' for the serving mode
    # Phase-layout IO (DeblurGANv2 serving): patches move host<->device as
    # (N, h/f, w/f, f*f*C) space_to_depth(f) tensors, the pad-to-block and
    # the depth-to-space fold into the native patch gather / blend-stitch
    # (native/tileblend.cpp), and apply_fn consumes/produces phase layout
    # (models/deblurgan/fold.py). Avoids every lane-starved C-channel
    # full-resolution HBM stream on the device.
    phase_io: bool = False
    phase_factor: int = 4
    extra: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        self._step_cache: dict = {}

    def _step(self):
        """The one jitted program: cast -> pad -> forward -> crop -> postprocess.

        Its compiled shape is (batch, patch_h, patch_w, C) only; jax.jit's
        own cache handles the rare variants (images smaller than the patch).
        """
        key = ("step", self.compute_dtype)
        if key not in self._step_cache:
            pad_factor, pad_block, postprocess = (
                self.pad_factor,
                self.pad_block,
                self.postprocess,
            )
            apply_fn = self.apply_fn
            compute_dtype = (
                jnp.dtype(self.compute_dtype) if self.compute_dtype else None
            )

            phase_io = self.phase_io

            def step(params, x):
                h, w = x.shape[1], x.shape[2]
                if compute_dtype is not None:
                    x = x.astype(compute_dtype)
                if phase_io:
                    # already padded + phase-packed by the native gather;
                    # the crop back happens in the phase blend-stitch
                    if compute_dtype is None:
                        with jax.default_matmul_precision("float32"):
                            y = apply_fn(params, x)
                    else:
                        y = apply_fn(params, x)
                    if postprocess is not None:
                        y = postprocess(y)
                    return y.astype(jnp.float32)
                if pad_factor:
                    x = pad_to_multiple(x, pad_factor, mode="reflect")
                elif pad_block:
                    x = pad_always_block(x, pad_block)
                if compute_dtype is None:
                    # parity mode: TPU XLA's default matmul/conv precision is
                    # bf16 passes (~1e-3 relative error per layer); force true
                    # float32 so the CSV matrix holds the 0.05 dB budget
                    with jax.default_matmul_precision("float32"):
                        y = apply_fn(params, x)
                else:
                    y = apply_fn(params, x)
                y = y[:, :h, :w, :]
                if postprocess is not None:
                    y = postprocess(y)
                return y.astype(jnp.float32)

            self._step_cache[key] = jax.jit(step)
        return self._step_cache[key]

    def forward_patches(
        self,
        patches: np.ndarray,
        progress_cb: Optional[Callable[[int, int], None]] = None,
        max_in_flight: int = 4,
    ) -> np.ndarray:
        """Run (N, h, w, C) through the jitted step in fixed-size chunks.

        Chunks are dispatched ahead of the fetches with a bounded window
        (``max_in_flight`` un-fetched chunks), so device compute overlaps
        host transfer without all patch outputs being device-resident at
        once. The tail that does not fill ``batch_size`` is decomposed into
        power-of-two sub-chunks (largest first) instead of being padded up
        to the full batch — no wasted device work, and the set of compiled
        shapes stays bounded by log2(batch)+1. ``progress_cb`` reports
        *completed* (fetched) patches.
        """
        step = self._step()
        n = patches.shape[0]
        bs = max(1, min(self.batch_size, n))
        sizes = [bs] * (n // bs)
        rem = n % bs
        for b in reversed(range(rem.bit_length())):
            if (rem >> b) & 1:
                sizes.append(1 << b)

        outs = []
        pending: list = []  # (size, device_array) in dispatch order
        done = 0

        def fetch_one():
            nonlocal done
            sz, dev = pending.pop(0)
            outs.append(np.asarray(dev))
            done += sz
            if progress_cb is not None:
                progress_cb(done, n)

        off = 0
        for sz in sizes:
            pending.append((sz, step(self.params, jnp.asarray(patches[off : off + sz]))))
            off += sz
            while len(pending) >= max_in_flight:
                fetch_one()
        while pending:
            fetch_one()
        return np.concatenate(outs, axis=0)


def run_model_inference(
    model: InferenceModel,
    input_img: np.ndarray,
    patch_size: Optional[int] = None,
    patch_overlap: Optional[int] = None,
    need_degradation: bool = False,
    noise_level: Optional[float] = None,
    progress_cb: Optional[Callable[[int, int], None]] = None,
):
    """Tiled inference over one image. Returns (restored_image, time_ms).

    ``input_img`` is HWC uint8/uint16/float; the output has the same dtype.
    """
    start_time = time.time()

    patch_size = model.patch_size if patch_size is None else patch_size
    patch_overlap = model.patch_overlap if patch_overlap is None else patch_overlap

    img = np.ascontiguousarray(model.normalize(input_img))
    h, w = img.shape[:2]
    out_ch = min(3, img.shape[2])

    ps, h_idx_list, w_idx_list = tile_indices(h, w, patch_size, patch_overlap)
    ph, pw = min(ps, h), min(ps, w)
    coords = [(hi, wi) for hi in h_idx_list for wi in w_idx_list]

    if model.phase_io:
        if need_degradation:
            raise ValueError("phase_io engine path has no AWGN support")
        block = model.pad_block or 32
        ph_pad = (ph // block + 1) * block
        pw_pad = (pw // block + 1) * block
        patches = native.extract_patches_phase(
            img, coords, ph, pw, ph_pad, pw_pad, model.phase_factor)
    else:
        patches = native.extract_patches(img, coords, ph, pw)
        if need_degradation and noise_level is not None:
            # bit-exact float64 AWGN add (reference arithmetic), once per batch
            patches = add_noise_batched(patches, noise_level)

    from tpuir.utils.profiling import maybe_trace

    with maybe_trace(f"engine_{model.name.replace(' ', '_')}"):
        preds = model.forward_patches(patches, progress_cb)

    window = gaussian_window(ps, ps, out_ch)[:ph, :pw]
    if model.phase_io:
        output_img = native.blend_stitch_phase(
            preds, coords, window, h, w, ph, pw, model.phase_factor)
    else:
        output_img = native.blend_stitch(preds[:, :, :, :out_ch], coords, window, h, w)
    output_img = restore_dtype(output_img, input_img)
    return output_img, (time.time() - start_time) * 1000.0
