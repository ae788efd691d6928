from .base import JaxLM, LM, Reorderer, rolling_token_windows
from .evaluator import evaluate, make_table, simple_evaluate
from .registry import MODEL_REGISTRY, TASK_REGISTRY, get_task_dict, list_tasks
from .task import MultipleChoiceTask, PerplexityTask, Request, Task
