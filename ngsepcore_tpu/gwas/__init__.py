from .glm import GeneralLinearModel
