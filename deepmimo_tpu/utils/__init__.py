"""Utility subpackage: containers, file IO, naming, compression."""

from .dotdict import DotDict, compare_two_dicts, PrintIfVerbose
from .files import (
    check_scen_name,
    get_scenarios_dir,
    get_scenario_folder,
    get_params_path,
    get_available_scenarios,
    save_dict_as_json,
    load_dict_from_json,
    get_txrx_str_id,
    get_mat_filename,
    save_mat,
    load_mat,
    zip,
    unzip,
)

__all__ = [
    "DotDict", "compare_two_dicts", "PrintIfVerbose",
    "check_scen_name", "get_scenarios_dir", "get_scenario_folder",
    "get_params_path", "get_available_scenarios",
    "save_dict_as_json", "load_dict_from_json",
    "get_txrx_str_id", "get_mat_filename", "save_mat", "load_mat",
    "zip", "unzip",
]
