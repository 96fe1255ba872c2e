from .masking import (
    mask_adjs,
    mask_nodes,
    symmetrize,
    check_adjs_symmetry,
    pad_adjs,
    get_sym_normal_noise,
    add_sym_normal_noise,
    adj_mask_2d,
)
from .attribute_code import (
    attribute_converter,
    attribute_int_to_ddpm,
    attribute_ddpm_to_int,
    attribute_int_to_bits,
    attribute_bits_to_int,
    attribute_int_to_one_hot,
    attribute_one_hot_to_int,
    dec2bin,
    bin2dec,
    reshape_node_attr_vec_to_mat,
    reshape_node_attr_mat_to_vec,
)
from .box_ops import (
    box_cxcywh_to_xyxy,
    box_iou_aligned,
    generalized_box_iou_loss,
    distance_box_iou_loss,
    complete_box_iou_loss,
)
