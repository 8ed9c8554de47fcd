"""CLI trainers — the main_source / main_target equivalents.

Entry points:
    python main_source.py <prefix> --method vae_train ...   (repo root shim)
    python main_target.py <prefix> --method domain_adaptation ...

Each is a thin argparse adapter (core/config.py) over `run(cfg)` in
source_main.py / target_main.py.
"""
