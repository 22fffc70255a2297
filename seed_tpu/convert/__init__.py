from .torch_convert import (convert_inception_torch, convert_llama,
                            convert_lora, convert_quantizer,
                            load_torch_state_dict)

__all__ = ["convert_inception_torch", "convert_llama", "convert_lora",
           "convert_quantizer", "load_torch_state_dict"]
