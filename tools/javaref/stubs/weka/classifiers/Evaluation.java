package weka.classifiers;
import weka.core.Instances;
public class Evaluation {
    public Evaluation(Instances data) { throw new UnsupportedOperationException("weka stub"); }
    public void evaluateModel(Classifier cls, Instances data) throws Exception { throw new UnsupportedOperationException("weka stub"); }
    public String toClassDetailsString(String header) { throw new UnsupportedOperationException("weka stub"); }
}
