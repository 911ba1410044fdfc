"""Flag surface -> R3DConfig plumbing (no device work)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3dfsseg_tpu.cli import args_to_config, build_parser  # noqa: E402


def _cfg(argv, eval_mode=False):
    args = build_parser(eval_mode=eval_mode).parse_args(argv)
    return args_to_config(args, eval_mode=eval_mode)


def test_defaults_match_reference_surface():
    cfg = _cfg([])
    assert cfg.n_way == 2 and cfg.k_shot == 5 and cfg.pc_npts == 2048
    assert cfg.edgeconv_widths == ((64, 64), (64, 64), (64, 64))
    assert cfg.dgcnn_mlp_widths == (512, 256)
    assert cfg.step_size == 5000 and cfg.gamma == 0.5
    # transformer defaults = the reference's EFFECTIVE architecture
    # (hard-coded 128/8/3/128, protonet.py:1141-1147)
    assert (cfg.d_model, cfg.n_head, cfg.n_layers, cfg.d_feed) == (128, 8, 3, 128)
    # TPU knobs
    assert cfg.lp_solver == "cheby" and cfg.lp_cg_iters == 50
    # episode_batch CLI default is the 0 = auto sentinel (one episode per
    # visible device; resolved by parallel.resolve_episode_batch at CLI
    # startup, so episode-DP engages automatically on multi-chip hosts)
    assert cfg.mesh_shape is None and cfg.episode_batch == 0
    from r3dfsseg_tpu.parallel import resolve_episode_batch
    import jax
    resolved = resolve_episode_batch(cfg)
    assert resolved.episode_batch == (
        len(jax.devices()) if len(jax.devices()) > 1 else 1)
    # explicit values pass through untouched
    assert resolve_episode_batch(_cfg(["--episode_batch", "3"])).episode_batch == 3


def test_mesh_flag_maps_to_mesh_shape():
    assert _cfg(["--mesh", "4"]).mesh_shape == (4,)
    assert _cfg(["--mesh", "0"]).mesh_shape is None


def test_list_flags_literal_eval():
    cfg = _cfg(["--edgeconv_widths", "[[8,8],[8,8]]",
                "--dgcnn_mlp_widths", "[16,16]",
                "--train_noise_ratio", "[0.0, 0.3]"])
    assert cfg.edgeconv_widths == ((8, 8), (8, 8))
    assert cfg.train_noise_ratio == (0.0, 0.3)
    assert cfg.feat_dim == 8 + cfg.output_dim + cfg.base_widths[-1]


def test_train_log_dir_layout():
    cfg = _cfg(["--save_path", "/tmp/x", "--cvfold", "1", "--n_way", "3",
                "--k_shot", "1", "--use_attention", "--log_dir", "run9"])
    assert cfg.log_dir == os.path.join("/tmp/x", "Cleantrain",
                                       "S1_N3_K1_Att1", "run9")


def test_eval_mode_flags():
    cfg = _cfg(["--noise_ratio", "0.4", "--noise_type", "ood",
                "--save_test_record", "--model_checkpoint_path", "/tmp/m"],
               eval_mode=True)
    assert cfg.noise_ratio == 0.4 and cfg.noise_type == "ood"
    assert cfg.save_test_record and cfg.log_dir == "/tmp/m"


def test_every_phase_choice_parses():
    for eval_mode in (False, True):
        p = build_parser(eval_mode=eval_mode)
        choices = next(a for a in p._actions if a.dest == "phase").choices
        for ph in choices:
            cfg = _cfg(["--phase", ph], eval_mode=eval_mode)
            assert cfg.phase == ph
