"""Echoview ECS calibration file support (lands with the ECS milestone)."""


def ecs_to_params(ecs_file, sonar_type, frequency_nominal):
    raise NotImplementedError("ECS parsing lands with the ECS milestone")
