from switch_nerf_tpu.utils.logger import setup_logger, main_log, main_print
from switch_nerf_tpu.utils.meters import DictAverageMeter
from switch_nerf_tpu.utils.visualize import visualize_scalars, voc_palette
