from ..core.support import toolbelt_deprecated
from .bboxes_utils import BBoxesMatchResult, box_iou, match_bboxes, match_bboxes_hungarian
from .bucket_assignment import (
    compute_bucket_imbalance_score,
    filler_bucket_assignment,
    naive_bucket_assignment,
    random_bucket_assignment,
)
from .fs import (
    auto_file,
    change_extension,
    find_images_in_dir,
    find_images_in_dir_recursive,
    find_in_dir,
    find_in_dir_with_ext,
    find_subdirectories_in_dir,
    has_image_ext,
    id_from_fname,
    read_image_as_is,
    read_rgb_image,
    zipdir,
)
from .checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from .compile_cache import enable_compile_cache
from .namesgenerator import get_random_name
from .profiling import Timer, benchmark, describe_compile, trace
from .python_utils import as_tuple_of_two, load_yaml, maybe_eval, without
from .random_utils import get_rng_state, set_manual_seed, set_rng_state
from .rle import rle_decode, rle_encode, rle_to_string
from .tensor import (
    argmax_over,
    softmax_over,
    count_parameters,
    describe_outputs,
    image_to_tensor,
    logit,
    mask_from_tensor,
    move_to_device,
    resize_like,
    rgb_image_from_tensor,
    sigmoid_with_threshold,
    tensor_from_rgb_image,
    to_numpy,
    to_tensor,
    transfer_weights,
)
from .visualization import (
    grid_stack,
    hstack_autopad,
    plot_compressed_confusion_matrix,
    plot_confusion_matrix,
    plot_heatmap,
    render_figure_to_tensor,
    vstack_autopad,
    vstack_header,
)
