"""LP-FT switch (run_stage2.py:741-747): optimizer rebuild at epoch
``lp_ft_epochs`` with everything unfrozen.

Pinned here: the EMA accumulated during the LP phase CARRIES OVER the
switch (the reference's timm ModelEma persists untouched across its
requires_grad flip; a TrainState.create at the switch would silently
reset it to the instantaneous params). Probe: with model_ema_decay=1.0
the EMA is mathematically constant — it must still equal the INITIAL
params after training through the switch; a reset would leave it at the
LP-phase-end params instead (the head trained during LP, so they differ).
"""

import os

import numpy as np
import pytest

from tests.test_entry_resume import _stage2_args, _write_annotations  # noqa: F401


@pytest.mark.slow
def test_lp_ft_switch_preserves_ema(tmp_path):
    import jax
    import jax.numpy as jnp

    from unite_tpu.train.run_stage2 import build_model, main
    from unite_tpu.utils import checkpoint as ck

    args = _stage2_args(tmp_path, tmp_path / "lpft", 2)
    args.lp_ft_epochs = 1
    args.model_ema = True
    args.model_ema_decay = 1.0  # EMA == its creation-time value, forever
    main(args)

    payload = ck.load_checkpoint(
        os.path.join(args.output_dir, "checkpoint-latest.msgpack"))
    assert payload.get("model_ema") is not None

    model = build_model(args)
    example = jnp.zeros(
        (1, args.num_frames, args.input_size, args.input_size, 3),
        jnp.bfloat16)
    init_params = model.init(jax.random.PRNGKey(args.seed),
                             example)["params"]

    # EMA must equal the INITIAL head (constant under decay 1.0, preserved
    # across the switch); the trained head differs from it
    np.testing.assert_array_equal(
        np.asarray(payload["model_ema"]["head"]["kernel"]),
        np.asarray(init_params["head"]["kernel"]))
    assert not np.array_equal(
        np.asarray(payload["model"]["head"]["kernel"]),
        np.asarray(init_params["head"]["kernel"]))
