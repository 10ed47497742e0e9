"""Text-analysis operators over the `documents` table. (Filled in task 4.)"""
