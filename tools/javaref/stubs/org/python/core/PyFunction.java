package org.python.core;
public class PyFunction extends PyObject {
}
