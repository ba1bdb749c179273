"""Test config: force an 8-device virtual CPU platform so collectives,
sharding, and pod-style behavior are exercised without TPU hardware
(SURVEY.md §4 — JAX's standard fake-multi-device mechanism).

Note: in this environment ``jax`` is pre-imported at interpreter startup
with a hardware platform pinned via ``JAX_PLATFORMS=axon``, so env-var
assignment alone is too late — we go through ``jax.config`` (and reset the
backend if something already initialized it)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    # a backend was already initialized: reset and reconfigure
    import jax.extend as jex

    jex.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8, (
    f"tests require the 8-device virtual CPU platform, got {jax.devices()}"
)

# persistent compilation cache: XLA:CPU AOT results are reusable across
# runs in this environment, which turns the compile-dominated suite into
# an execution-dominated one on reruns (VERDICT r2 weak #6: fast gate
# must come in under 5 minutes)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/iseg_tpu_xla_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------- markers
# Long-running tests (>= ~12 s of XLA:CPU compile each, measured with
# --durations; VERDICT round-1 weak #7): auto-marked ``slow`` so the fast
# gate (`pytest tests/ -q`, addopts deselect slow+parity) finishes in one
# CI window. Full coverage: `pytest -m slow` / `-m parity` / `-m ""`.

import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_callbacks_fire_in_train_loop",
    "test_intern_image_dense_local_runs",
    "test_efficientnetb2_width_scaling",
    "test_swin_tiny_map_full_coverage",
    "test_core_train_sharded_epoch",
    "test_dcnv3_dense_local_mode",
    "test_fused_loss_gradients_match",
    "test_swin_train_mode_with_droppath",
    "test_efficientnetb0_endpoints",
    "test_intern_image_tiny",
    "test_profiler_window_writes_trace",
    "test_efficientnetb0_map_full_coverage",
    "test_train_step_decreases_loss",
    "test_sharded_windows_with_real_model",
    "test_moat0",
    "test_hrnet_w48_map_full_coverage",
    "test_bit_exact_rerun",
    "test_generation_matches_stepwise_forward",
    "test_hrnet_endpoints_and_concat",
    "test_convnext_tiny_endpoints",
    "test_eva02_patch_dropout_trains",
    "test_convnext_v2_has_grn_no_layerscale",
    "test_mobilenetv2_map_full_coverage",
    "test_cpu_cache_path_matches_fused",
    "test_segmanaged_train_mode_updates_batch_stats",
    "test_swin_handles_non_multiple_window_sizes",
    "test_bucketed_eval_bounds_compiles",
    "test_resnet18_endpoints",
    "test_segmanaged_forward",
    "test_vit_input_size_free",
    "test_cached_forward_matches_uncached",
    "test_resnet50_bottleneck_channels",
    "test_mobilenetv2_input_size_free",
    "test_swin_tiny_endpoints",
    "test_train_with_device_augment",
    "test_xception65_endpoints",
    "test_predict_with_dir",
    "test_mobilenetv2_endpoints_strides",
    "test_multi_scale_inference_with_model",
    "test_xception65_map_full_coverage",
    "test_dense_local_ref_matches_reference_gather",
    "test_dcnv3_auto_mode_matches_gather",
    # round-3 re-bucketing (VERDICT r2 weak #6: fast tier must be a quick
    # inner loop; this host is 1-vCPU so XLA:CPU runs serial): every test
    # measured >= ~9 s warm-cache moves to the slow tier — all still run
    # and are recorded in the full gate (tools/run_gate.py).
    "test_custom_vjp_matches_xla_grads",
    "test_sharded_step_matches_single_device",
    "test_calibration_detects_large_offsets",
    "test_calibrated_model_matches_reference_gather",
    "test_intern_image_tiny_map_full_coverage",
    "test_moat0_map_full_coverage",
    "test_gemma_pp_loss_and_grads_match",
    "test_dcnv2_dense_local_mode",
    "test_dense_local_taps_match_gather",
    "test_load_pretrained_backbone_ingests_h5",
    "test_mobilenetv2_output_stride_16",
    "test_dense_local_matches_gather_in_range",
    "test_gemma_ring_loss_and_grads_match",
    "test_kernel_channel_blocking_path",
    "test_dense_local_clamps_out_of_range",
    "test_export_int8_weights",
    "test_kernel_matches_xla_exactly",
    "test_calibrate_dcn_sampling_reports_layers",
    "test_dense_local_zero_offsets_is_modulated_conv_sum",
    "test_fused_loss_matches_plain_path",
    "test_gradients_flow_to_offsets",
    "test_eva02_tiny_and_rope",
    "test_mobilenetv2_keras_h5_roundtrip",
    "test_fapn_head",
    "test_core_train_writes_scalars",
    "test_convnext_dilated_os16",
    # round-4 re-bucketing (VERDICT r3 #7: fast tier < 300 s warm on this
    # 1-vCPU host): every non-mesh test measured >= ~5 s warm-cache moves
    # to the slow tier. All still run in the recorded gate (run_gate.py).
    "test_small_offsets_keep_fast_path",
    "test_hrnet_w_fold_matches_plain_path",
    "test_second_train_call_reuses_logger_cleanly",
    "test_pyramid_heads_select_by_resolution_for_hrnet",
    "test_convnext_tiny_map_full_coverage",
    "test_segmanaged_aux_outputs",
    "test_load_pretrained_name_map_accepts_unwrapped_paths",
    "test_vit_sam_has_no_class_token",
    "test_xception65_output_stride_16",
    "test_fused_gate_defers_to_configured_reduction",
    "test_resnet50_map_full_coverage",
    "test_export_roundtrip_matches_live_model",
    "test_context_decode_matches_monolithic_forward",
    "test_ragged_prompts_fill_pad_gap_and_match_unpadded",
    "test_beam_improves_or_matches_likelihood",
    "test_dcnv3_shapes_and_finite",
    "test_dcnv2_gradients_flow",
    "test_calibration_tap_stays_out_of_intermediates",
    "test_evaluate_with_loss",
    "test_mlp_mixer_b16_map_full_coverage",
    "test_vit_base_map_full_coverage",
    "test_eva02_tiny_map_full_coverage",
    "test_export_multi_scale_flip",
    "test_enable_ema_on_resume_from_pre_ema_checkpoint",
    "test_ema_params_track_and_eval",
    "test_calibrate_on_backbone",
    "test_checkpoint_save_restore",
    "test_convnext_v2_tiny_map_full_coverage",
    "test_resnet101_map_full_coverage",
    "test_restore_ema_checkpoint_into_non_ema_state",
    "test_quantize_structure_and_error",
    "test_wfolded_block_gradients_match",
    "test_mlp_mixer",
    "test_score_close_to_dense",
    "test_causal_lm_scores_real_tokens",
}

# Modules whose tests exercise the 8-virtual-device mesh (collectives,
# GSPMD sharding, pod-style data partitioning, true multi-process runs).
# They form the ``mesh`` tier (VERDICT r3 #7): deselected from the fast
# inner loop, run + recorded as their own gate section.
_MESH_MODULES = {
    "test_dp_equivalence",
    "test_distributed_metrics",
    "test_sharded_sliding",
    "test_fsdp",
    "test_moe",
    "test_pipeline",
    "test_ring_attention",
    "test_sequence_parallel",
    "test_resident",
    "test_resident_capacity",
    "test_shards",
    "test_loader_parallel",
    "test_multiprocess",
}

# Individual mesh-bound tests living in otherwise single-device modules.
_MESH_TESTS = {
    "test_tp_layout_shards_over_model_axis",
    "test_core_train_sharded_epoch",
    "test_sharded_windows_with_real_model",
    "test_sharded_step_matches_single_device",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        if name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        if item.module.__name__ in _MESH_MODULES or name in _MESH_TESTS:
            item.add_marker(pytest.mark.mesh)
