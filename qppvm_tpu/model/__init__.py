from qppvm_tpu.model.robot import RobotModel, RobotState, build_model  # noqa: F401
from qppvm_tpu.model import spatial, kinematics, dynamics, zoo  # noqa: F401
