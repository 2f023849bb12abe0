"""Test harness: run everything on CPU with 8 virtual devices so that
multi-chip sharding (pjit over a Mesh) is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel);
# the config update below takes precedence over the env var.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is jit-compile dominated on
# CPU, so repeated local runs skip recompiles entirely.  Keyed by program +
# flags, so the forced 8-device topology above stays consistent.
_cache_dir = os.environ.get(
    "SGC_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Duration-derived fast tier: every test that measured >=10s on the CPU
# harness (pytest --durations, 2026-08-18; re-tiered 2026-08-21 from a run
# under 2x CPU contention, so those entries' noted times are ~2x solo) is
# marked slow here centrally, on top of the explicit @pytest.mark.slow
# decorations on the reference-parity and dress-rehearsal suites.
# `pytest -m "not slow"` is the <3-minute iteration tier; the full suite
# (no marker filter) is unchanged.
_SLOW_BY_MEASURED_DURATION = {
    # --- re-tiered 2026-08-21 (times measured contended, ~2x solo) ---
    "test_fused_backbone_flag_in_encode",                # 90s contended
    "test_tde_keeps_masks_and_connectivity",             # 38s contended
    "test_prepare_cs_resumes_from_per_image_artifacts",  # 37s contended
    "test_predictor_sgcls_mode_decodes_labels",          # 36s contended
    "test_apply_glove_init_replaces_rows",               # 31s contended
    "test_eval_step_sharded_matches_single_device",      # 14s contended
    # NOT re-tiered (advisor r4): test_fused_block_matches_module (33s
    # contended, ~16s solo) and test_fused_block_downsample_matches_module
    # (16s contended, ~8s solo) stay in the fast tier — they are the
    # primary quick numerical gate for the Pallas kernels, and the
    # contended measurements overstate their solo cost ~2x.
    "test_biased_head_matches_flat_softmax",             # 12s contended
    "test_oiv6_eval_reports_wmap",                       # 10s contended
    # --- 2026-08-18 tier ---
    "test_cli_synthetic_smoke",          # engines 430s, label_transfer 29s
    "test_cli_predictor_smoke",                                   # 322s
    "test_sharded_detect_fn_matches_single_device",               # 113s
    "test_train_overfits_tiny_batch",                             # 70s
    "test_detr_featurize_fn",                                     # 69s
    "test_prepare_depth_oiv6",                # 84s (CLI wiring drive)
    "test_factored_equals_reference_math_hierarchical",           # 69s
    "test_detr_shapes",                                           # 66s
    "test_checkpoint_restore",                                    # 66s
    "test_faithful_mode_train_step_runs",                         # 65s
    "test_train_step_sharded_matches_replicated_semantics",       # 59s
    "test_bf16_allreduce_close_to_f32",                           # 59s
    "test_predictor_end_to_end",                                  # 45+13+11s
    "test_pnp_train_step_with_commonsense_penalty",               # 43s
    "test_prepare_cs_end_to_end",                                 # 41s
    "test_pnp_train_step_decreases_loss",                         # 40+33s
    "test_converter_structure_matches_model",                     # 39s
    "test_tp_step_matches_replicated",                            # 31s
    "test_fit_smoke",                                             # 28s
    "test_pnp_sharded_eval_matches_single_device",                # 23s
    "test_train_step_single_device",                              # 22s
    "test_vctree_structure_params_receive_gradient",              # 22s
    "test_train_step_reports_overflow",                           # 20s
    "test_eval_cs_filters_confidences",                           # 20s
    "test_factored_equals_reference_math_flat",                   # 19s
    "test_faithful_losses_match_reference",                       # 18+10s
    "test_compute_param_cache_is_bit_identical",                  # 18s
    "test_train_step_no_overflow_at_full_capacity",               # 16s
    "test_relation_converter_exact_under_f64",                    # 14s
    "test_supcon_hierar_padding_invariance",                      # 14s
    "test_tde_zero_when_visual_uninformative",                    # 14s
    "test_momentum_dtype_bf16_buffer",                            # 14s
    "test_pnp_eval_produces_recall",                              # 11s
    "test_vtranse_train_step_decreases_loss",                     # 10s
    "test_context_shapes_and_jit",                                # 10+8+8s
    "test_scalar_writer_records",                                 # 10s
    "test_commonsense_loss_hierarchical",                         # 9s
    "test_postprocess_detections",                                # 8s
    "test_supcon_hierar_matches_reference_math",                  # 8s
    "test_relation_loss_hierarchical",                            # 7s
    "test_masked_bilstm_padding_invariance",                      # 7s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in _SLOW_BY_MEASURED_DURATION:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
