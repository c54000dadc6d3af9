from .convert import convert_state_dict, load_reference_pickle
from .misc import assert_shape, tree_paths
