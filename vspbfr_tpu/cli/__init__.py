"""CLI entry points mirroring the reference's three drivers (SURVEY.md §2.7):

  python -m vspbfr_tpu.cli.infer           <- restoration_test.py
  python -m vspbfr_tpu.cli.train_restore   <- restoration_train.py
  python -m vspbfr_tpu.cli.train_diffuser  <- code_diffuser_train.py
"""
