"""CLI entry points (python -m autonomous_quadrotor_environment_tpu.apps.<name>).

Replaces the reference's standalone scripts (SURVEY.md §2 #28: ppo.py,
vldg_training.py, vldg_eval.py, PID_control.py, lqr_quad.py, trainer_vldg.sh)
with a unified set of argparse apps over the library."""
