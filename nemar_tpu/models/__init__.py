"""Model registry (reference models/__init__.py — SURVEY.md §3.1).

``--model nemar`` resolves ``models/nemar_model.py`` class ``NEMARModel``
by naming convention (find_model_using_name); models inject their flags via
``modify_commandline_options`` during option parsing. This string-registry
pattern is part of the public API surface (SURVEY.md §2).
"""

from __future__ import annotations

import importlib

from nemar_tpu.models.base_model import BaseModel


def find_model_using_name(model_name: str):
    model_filename = f"nemar_tpu.models.{model_name}_model"
    modellib = importlib.import_module(model_filename)
    target_name = model_name.replace("_", "") + "model"
    for name, cls in modellib.__dict__.items():
        if name.lower() == target_name and issubclass(cls, BaseModel):
            return cls
    raise NotImplementedError(
        f"In {model_filename}.py there should be a subclass of BaseModel "
        f"with class name that matches {target_name} in lowercase."
    )


def get_option_setter(model_name: str):
    return find_model_using_name(model_name).modify_commandline_options


def create_model(opt):
    model_class = find_model_using_name(opt.model)
    instance = model_class(opt)
    print(f"model [{type(instance).__name__}] was created")
    return instance
