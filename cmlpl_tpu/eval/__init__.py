from cmlpl_tpu.eval.metrics import cal_accuracy  # noqa: F401
from cmlpl_tpu.eval.inference import ScenePredictor  # noqa: F401
from cmlpl_tpu.eval.visualize import draw_result, save_class_map  # noqa: F401
from cmlpl_tpu.eval.report import results_dataframe, save_report  # noqa: F401
from cmlpl_tpu.eval.validation import validation_accuracy  # noqa: F401
