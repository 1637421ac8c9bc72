from .flash_attention import attention_reference, flash_attention
