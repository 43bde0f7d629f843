package org.python.core;
public class PyClass extends PyObject {
}
