from n_body_problem_tpu.io.tipsy import read_tipsy, write_tipsy
from n_body_problem_tpu.io.text import (
    read_tab,
    read_dat,
    read_snap,
    read_csv,
    write_tab,
    write_snap,
)
from n_body_problem_tpu.io.datasets import DATASETS, DatasetSpec, load_dataset
from n_body_problem_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from n_body_problem_tpu.io.convert import tipsy_to_csv

__all__ = [
    "read_tipsy",
    "write_tipsy",
    "read_tab",
    "read_dat",
    "read_snap",
    "read_csv",
    "write_tab",
    "write_snap",
    "DATASETS",
    "DatasetSpec",
    "load_dataset",
    "save_checkpoint",
    "load_checkpoint",
    "tipsy_to_csv",
]
